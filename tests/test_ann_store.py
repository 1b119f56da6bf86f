"""Persisted IVF ANN index (operators/ann_store.py, x79).

The x79 DuckDB oracle pins the exact-panel half cross-engine; these
tests pin the store mechanics the oracle can't see: search parity with
the in-memory engine (the r11 verdict's "oracle-equal search vs
in-memory IVF" criterion), frozen-centroid append semantics, id
hygiene, replay guards across compaction, and manifest crash-safety --
the same contract matrix as test_minhash_store.py, for the ANN layout.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64


def _vecs(spark, ids, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for i in ids:
        rng_i = np.random.RandomState(seed * 100003 + i)
        v = rng_i.randn(DIM)
        v = v / np.linalg.norm(v)
        rows.append((int(i), [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _rows(df):
    return {
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in df.select("query_id", "vec_id", "score", "rank").collect()
    }


@pytest.fixture()
def corpus(spark):
    return _vecs(spark, range(80))


@pytest.fixture()
def batch(spark):
    return _vecs(spark, range(100, 120))


def test_store_search_equals_in_memory(spark, corpus, tmp_path):
    """A freshly built store searched with ann_store_search must return
    row-for-row what build_ivf_index + ivf_search_batch return on the
    same corpus and seed: the persisted assignment IS the in-memory
    assignment, written down."""
    from conecta_spark.operators.ann_store import (
        ann_store_search,
        write_ann_store,
    )
    from conecta_spark.operators.simsearch import (
        build_ivf_index,
        ivf_search_batch,
    )

    path = str(tmp_path / "ann")
    m = write_ann_store(corpus, path, n_clusters=8)
    assert m["n_vecs"] == 80 and m["n_appended"] == 0
    got = _rows(
        ann_store_search(spark, path, [0, 1, 2], k=5, n_probe=3)
    )
    index = build_ivf_index(corpus, n_clusters=8)
    try:
        want = _rows(ivf_search_batch(index, [0, 1, 2], k=5, n_probe=3))
    finally:
        index.unpersist()
    assert got == want and got  # non-vacuous


def test_append_assigns_against_stored_centroids(spark, corpus, batch, tmp_path):
    """Frozen-centroid semantics: an appended batch's cell assignments
    must equal assign_cells against the stored centroid matrix (no
    retrain), and a search over the appended store must equal the
    in-memory engine over base-assigned + batch-assigned unioned."""
    from conecta_spark.operators.ann_store import (
        _assigned_relation,
        append_ann_batch,
        ann_store_search,
        read_ann_manifest,
        read_centroids,
        write_ann_store,
    )
    from conecta_spark.operators.simsearch import (
        IVFIndex,
        assign_cells,
        build_ivf_index,
        ivf_search_batch,
    )

    path = str(tmp_path / "ann")
    write_ann_store(corpus, path, n_clusters=8)
    m = append_ann_batch(spark, path, batch, batch_id="day-001")
    assert m["applied_batches"] == ["day-001"]
    assert m["n_appended"] == 20 and m["n_vecs"] == 80  # drift signal

    centers = read_centroids(path)
    stored = _assigned_relation(spark, path, read_ann_manifest(path))
    stored_batch = {
        (r.vec_id, r.cell)
        for r in stored.where(F.col("vec_id") >= 100).collect()
    }
    new_vecs = batch.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    direct = {
        (r.vec_id, r.cell)
        for r in assign_cells(new_vecs, centers, "vec_id").collect()
    }
    assert stored_batch == direct and len(stored_batch) == 20

    # search parity: in-memory twin = base index + batch assigned with
    # the SAME (stored == base-trained) centroids
    index = build_ivf_index(corpus, n_clusters=8)
    try:
        twin = IVFIndex(
            index.assigned.unionByName(
                assign_cells(new_vecs, index.centers, "vec_id")
            ),
            index.centers,
            "vec_id",
        )
        want = _rows(ivf_search_batch(twin, [0, 101], k=5, n_probe=3))
    finally:
        index.unpersist()
    got = _rows(ann_store_search(spark, path, [0, 101], k=5, n_probe=3))
    assert got == want and got
    # the batch side is actually searchable (query 101 lives in it)
    assert any(q == 101 for q, *_ in got)


def test_append_rejects_overlapping_ids(spark, corpus, tmp_path):
    from conecta_spark.operators.ann_store import (
        append_ann_batch,
        write_ann_store,
    )

    path = str(tmp_path / "ann")
    write_ann_store(corpus, path, n_clusters=8)
    with pytest.raises(ValueError, match="share vector ids"):
        append_ann_batch(spark, path, corpus.limit(3))


def test_replay_guards_survive_compaction(spark, corpus, batch, tmp_path):
    """append is idempotent by batch_id, including after a compaction
    moved the id to compacted_batches and the dir aged out -- the same
    exactly-once matrix as the signature store."""
    from conecta_spark.operators import ann_store as mod
    from conecta_spark.operators.ann_store import (
        _assigned_relation,
        append_ann_batch,
        compact_ann_store,
        read_ann_manifest,
        write_ann_store,
    )

    path = str(tmp_path / "ann")
    write_ann_store(corpus, path, n_clusters=8)
    append_ann_batch(spark, path, batch, batch_id="day-001")
    m1 = append_ann_batch(spark, path, batch, batch_id="day-001")
    assert m1["n_appended"] == 20  # booked once

    m2 = compact_ann_store(spark, path)
    assert m2["generation"] == 1
    assert m2["applied_batches"] == []
    assert m2["compacted_batches"] == ["day-001"]
    # grace: the superseded base and folded batch dir survive the commit
    assert os.path.isdir(os.path.join(path, "assigned"))
    assert os.path.isdir(os.path.join(path, "batches", "day-001"))
    # age them out, sweep-only pass removes them
    orig = mod._ANN_SWEEP_GRACE_NS
    mod._ANN_SWEEP_GRACE_NS = 0
    try:
        compact_ann_store(spark, path)
    finally:
        mod._ANN_SWEEP_GRACE_NS = orig
    assert not os.path.exists(os.path.join(path, "assigned"))
    assert not os.path.exists(os.path.join(path, "batches", "day-001"))
    # replay of the folded id: still a no-op
    m3 = append_ann_batch(spark, path, batch, batch_id="day-001")
    assert m3["n_appended"] == 20
    rel = _assigned_relation(spark, path, read_ann_manifest(path))
    assert rel.count() == 100
    assert rel.where(F.col("vec_id") == 100).count() == 1


def test_compaction_preserves_search(spark, corpus, batch, tmp_path):
    """Compaction is purely physical: search results are row-identical
    before and after the fold."""
    from conecta_spark.operators.ann_store import (
        ann_store_search,
        append_ann_batch,
        compact_ann_store,
        write_ann_store,
    )

    path = str(tmp_path / "ann")
    write_ann_store(corpus, path, n_clusters=8)
    append_ann_batch(spark, path, batch, batch_id="day-001")
    before = _rows(ann_store_search(spark, path, [0, 101], k=5, n_probe=3))
    compact_ann_store(spark, path)
    after = _rows(ann_store_search(spark, path, [0, 101], k=5, n_probe=3))
    assert after == before and after


def test_half_built_store_reads_as_absent(spark, corpus, tmp_path):
    from conecta_spark.operators.ann_store import (
        ANN_MANIFEST,
        read_ann_manifest,
        write_ann_store,
    )

    path = str(tmp_path / "ann")
    write_ann_store(corpus, path, n_clusters=8)
    os.remove(os.path.join(path, ANN_MANIFEST))
    with pytest.raises(FileNotFoundError):
        read_ann_manifest(path)

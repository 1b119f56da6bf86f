"""Behavior + plan tests for the round-4 fifth-pass operators: semantic
dedup (x54), semantic contamination (x55), and truncated-vocab OOV scoring
(x56).  Oracle parity is covered by test_oracle.py's registry sweep; these
pin the semantics and the scale properties."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from conecta_spark.functions.quality import oov_stats
from conecta_spark.operators.simsearch import (
    semantic_contamination,
    semantic_dedup,
)
from conecta_spark.queries import _load_extensions

from .test_plans import node_count, plan, sf  # noqa: F401 (sf: fixture)

_load_extensions()


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=lb)
         for i, v, lb in rows]
    )


# Orthogonal basis vectors in 64-dim: e_i has 1.0 at position i.
def _e(i, dim=64, scale=1.0):
    v = [0.0] * dim
    v[i] = scale
    return v


def _mix(i, j, a, b, dim=64):
    v = [0.0] * dim
    v[i] = a
    v[j] = b
    return v


# -- x54 semantic dedup ------------------------------------------------------


def test_semantic_dedup_flags_only_within_cell_cosine(spark):
    # Centroids are vec_id 0..7 (orthogonal axes) and are corpus members
    # themselves.  vec 9 and 10 land in cell 0, each ~0.89 cosine from the
    # seed (below the 0.9 threshold) but ~0.9998 from each other: only the
    # higher id is flagged.  vec 11 sits alone in cell 1 -> kept.
    rows = [(i, _e(i), 0) for i in range(8)]
    rows += [
        (9, _mix(0, 1, 1.0, 0.5), 0),
        (10, _mix(0, 1, 1.0, 0.52), 0),
        (11, _mix(1, 2, 1.0, 0.5), 0),
    ]
    out = {
        r.vec_id: (r.centroid_id, r.is_dup)
        for r in semantic_dedup(_vecs(spark, rows), k=8, threshold=0.9).collect()
    }
    assert out[9] == (0, 0)  # lower id in its cell: kept
    assert out[10] == (0, 1)  # near-parallel to 9, same cell: dup
    assert out[11] == (1, 0)  # alone near centroid 1: kept
    # the centroid seed vectors themselves are their own cells' keepers
    assert all(out[i] == (i, 0) for i in range(8))


def test_semantic_dedup_misses_cross_cell_pairs_by_design(spark):
    # Two near-identical vectors assigned to DIFFERENT cells are not
    # compared -- the documented SemDeDup recall trade.  Both stay ~0.74
    # cosine from their seeds (below the 0.8 threshold) but are 0.994 from
    # each other.
    rows = [(i, _e(i), 0) for i in range(8)]
    rows += [
        (20, _mix(0, 1, 1.0, 0.9), 0),   # cell 0 (dot 1.0 vs 0.9)
        (21, _mix(0, 1, 0.9, 1.0), 0),   # cell 1
    ]
    out = {
        r.vec_id: r.is_dup
        for r in semantic_dedup(_vecs(spark, rows), k=8, threshold=0.8).collect()
    }
    assert out[20] == 0 and out[21] == 0


def test_semantic_dedup_plan_no_cartesian(spark, sf):
    from conecta_spark.queries import REGISTRY

    p = plan(REGISTRY["x54_semantic_dedup"].fn(spark, sf))
    assert "CartesianProduct" not in p
    # the only broadcast nested loops are one-row broadcasts (the centroid
    # array, joined once per reference to the persisted assignment)
    assert node_count(p, "BroadcastNestedLoopJoin") <= 3


# -- x55 semantic contamination ----------------------------------------------


def test_semantic_contamination_flags_paraphrase_neighbors(spark):
    rows = [
        (0, _e(0), 9),                     # benchmark vector
        (1, _e(1), 9),                     # benchmark vector
        (10, _mix(0, 2, 1.0, 0.1), 0),     # ~parallel to bench 0 -> hit
        (11, _e(3), 0),                    # orthogonal -> clean
    ]
    out = semantic_contamination(
        _vecs(spark, rows), bench_label=9, threshold=0.9
    ).collect()
    assert [(r.vec_id, r.bench_id) for r in out] == [(10, 0)]
    assert out[0].score > 0.99


def test_semantic_contamination_tie_breaks_to_lowest_bench_id(spark):
    rows = [
        (0, _e(0), 9),
        (1, _e(0), 9),           # identical benchmark vectors
        (10, _e(0), 0),          # equally close to both
    ]
    out = semantic_contamination(
        _vecs(spark, rows), bench_label=9, threshold=0.5
    ).collect()
    assert [(r.vec_id, r.bench_id) for r in out] == [(10, 0)]


def test_semantic_contamination_plan_zero_corpus_shuffle(spark, sf):
    # The corpus side must not shuffle: the only exchange feeds the
    # one-row benchmark aggregate that gets broadcast.
    from conecta_spark.queries import REGISTRY

    p = plan(REGISTRY["x55_semantic_contamination"].fn(spark, sf))
    assert "CartesianProduct" not in p
    assert node_count(p, "Exchange") <= 1


# -- x56 OOV-rate scoring ----------------------------------------------------


def test_oov_stats_counts_and_means(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a b"),
            Row(doc_id=1, text="a zz"),
        ]
    )
    # vocab_size=2 -> vocab is {a: 3, b: 1}; zz is OOV.
    out = {r.doc_id: r for r in oov_stats(docs, vocab_size=2).collect()}
    assert (out[0].n_tok, out[0].n_oov, out[0].invocab_c_sum) == (3, 0, 7)
    assert out[0].mean_invocab_df == 7 / 3
    assert (out[1].n_tok, out[1].n_oov, out[1].invocab_c_sum) == (2, 1, 3)
    assert out[1].mean_invocab_df == 3.0


def test_oov_stats_all_oov_doc_has_null_mean(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="x x x"), Row(doc_id=1, text="q")]
    )
    out = {r.doc_id: r for r in oov_stats(docs, vocab_size=1).collect()}
    assert out[1].n_oov == 1
    assert out[1].mean_invocab_df is None


def test_oov_plan_is_map_side_after_vocab(spark, sf):
    # One shuffle builds the vocabulary; the doc relation itself is
    # scored map-side (broadcast map, no exploded-token join back).
    from conecta_spark.queries import REGISTRY

    p = plan(REGISTRY["x56_oov_rate"].fn(spark, sf))
    assert "CartesianProduct" not in p
    # vocab partial agg + final agg exchange, plus the TakeOrdered; the
    # documents scan must not feed any Exchange.
    assert node_count(p, "Exchange") <= 2

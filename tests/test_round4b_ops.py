"""Behavior + plan tests for the round-4 second-wave operators: span-level
dedup (x40), balanced source mixing (x41), centroid assignment (x42), and
the recursive-CTE / lateral SQL shapes (q49/q50)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from conecta_spark.operators.dedup import span_dedup_stats
from conecta_spark.functions.sampling import balanced_source_mix
from conecta_spark.operators.simsearch import centroid_assign
from conecta_spark.queries import REGISTRY, _load_extensions

from .test_plans import node_count, plan

_load_extensions()


# ---------------------------------------------------------------------------
# x40 span dedup
# ---------------------------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_span_dedup_finds_planted_boilerplate(spark):
    boiler = "one two three four five six seven eight"
    df = _docs(
        spark,
        [
            boiler + " unique tail alpha beta gamma delta epsilon zeta",
            boiler + " other ending words here now so forth etc",
            "completely different text with no shared span at all",
        ],
    )
    rows = {r.doc_id: r for r in span_dedup_stats(df).collect()}
    # Docs 0 and 1 share exactly their first 8-word span; their tails and
    # all of doc 2 are unique.
    assert rows[0].n_spans == 2 and rows[0].n_dup_spans == 1
    assert rows[1].n_spans == 2 and rows[1].n_dup_spans == 1
    assert rows[2].n_dup_spans == 0


def test_span_dedup_counts_intra_document_repeats(spark):
    span = "a b c d e f g h"
    df = _docs(spark, [span + " " + span])  # same span twice in ONE doc
    row = span_dedup_stats(df).collect()[0]
    assert row.n_spans == 2 and row.n_dup_spans == 2


def test_span_dedup_short_doc_single_partial_span(spark):
    df = _docs(spark, ["just three words"])
    row = span_dedup_stats(df).collect()[0]
    assert row.n_spans == 1 and row.n_dup_spans == 0


def test_span_dedup_shuffles_hashes_not_text(spark, oracle_dir):
    """The exploded relation is (doc_id, hash16) -- the Exchanges must not
    carry the text column (the whole point of hashing the spans)."""
    p = plan(REGISTRY["x40_span_dedup"].fn(spark, oracle_dir))
    for ln in p.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln, ln
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# x41 balanced source mix
# ---------------------------------------------------------------------------


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append(Row(doc_id=i, source=src, n_chars=100 + i % 7))
            i += 1
    return spark.createDataFrame(rows)


def test_mix_keeps_smallest_source_whole(spark):
    df = _corpus(spark, {"small": 40, "big": 400})
    out = {r.source: r for r in balanced_source_mix(df).collect()}
    assert out["small"].n_kept == 40  # threshold 10000*40/40 keeps all
    # The big source lands within ~20% of the 40-doc target (hash buckets
    # are uniform but finite).
    assert 25 <= out["big"].n_kept <= 55
    assert out["big"].n_total == 400


def test_mix_is_deterministic_and_a_subset(spark):
    df = _corpus(spark, {"a": 60, "b": 200, "c": 90})
    one = sorted(map(tuple, balanced_source_mix(df).collect()))
    two = sorted(map(tuple, balanced_source_mix(df).collect()))
    assert one == two


def test_mix_never_shuffles_corpus(spark, oracle_dir):
    """Counts and the min-target join back via broadcast; the documents
    relation itself reaches its aggregation without a join shuffle."""
    p = plan(REGISTRY["x41_balanced_source_mix"].fn(spark, oracle_dir))
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert "BroadcastHashJoin" in p


# ---------------------------------------------------------------------------
# x42 centroid assignment
# ---------------------------------------------------------------------------


def _vectors(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)]
    )


def test_centroids_self_assign_on_orthogonal_basis(spark):
    # 4 orthogonal centroids + 4 extra vectors each clearly nearest one.
    base = [
        [10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0], [0, 0, 0, 10],
        [9, 1, 0, 0], [1, 9, 0, 0], [0, 0, 8, 2], [0, 1, 1, 8],
    ]
    out = {
        r.centroid_id: r.n_assigned
        for r in centroid_assign(_vectors(spark, base), k=4).collect()
    }
    assert out == {0: 2, 1: 2, 2: 2, 3: 2}


def test_centroid_assign_zero_vector_ties_to_lowest_cid(spark):
    vecs = [[1, 0], [0, 1], [0, 0]]  # zero vector scores 0 on both
    out = centroid_assign(_vectors(spark, vecs), k=2).collect()
    by_cid = {r.centroid_id: r for r in out}
    # zero vector joins centroid 0 by the (score, -cid) tie-break
    assert by_cid[0].n_assigned == 2
    assert by_cid[1].n_assigned == 1


def test_centroid_assign_is_map_side(spark, oracle_dir):
    """One broadcast of the one-row centroid array; the embeddings scan
    flows to an 8-row aggregate with no join shuffle of the data."""
    p = plan(REGISTRY["x42_centroid_assign"].fn(spark, oracle_dir))
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert node_count(p, "BroadcastNestedLoopJoin") == 1
    # Only the centroid-collapse and the census aggregation may exchange.
    assert node_count(p, "Exchange") <= 2, p


# ---------------------------------------------------------------------------
# q49 / q50 SQL shapes
# ---------------------------------------------------------------------------


def test_month_spine_is_gapless(spark, oracle_dir):
    rows = (
        REGISTRY["q49_recursive_month_spine"]
        .fn(spark, oracle_dir)
        .orderBy("month_start")
        .collect()
    )
    months = [r.month_start for r in rows]
    span = (months[-1].year - months[0].year) * 12 + (
        months[-1].month - months[0].month
    )
    assert len(months) == span + 1  # every month present exactly once
    assert all(m.day == 1 for m in months)


def test_recursive_spine_scans_orders_once_per_side(spark, oracle_dir):
    """The recursion is over a one-row frame; the join side scans orders
    once (UnionLoop materializes the spine, not the fact table)."""
    p = plan(REGISTRY["q49_recursive_month_spine"].fn(spark, oracle_dir))
    assert "UnionLoop" in p


def test_lateral_topk_decorrelates_to_window_group_limit(spark, oracle_dir):
    p = plan(REGISTRY["q50_lateral_topk_per_region"].fn(spark, oracle_dir))
    assert "WindowGroupLimit" in p  # not re-executed per outer row
    df = REGISTRY["q50_lateral_topk_per_region"].fn(spark, oracle_dir)
    per_region = (
        df.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n <= 2 for r in per_region)

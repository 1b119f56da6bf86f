"""Behavior + plan tests for the round-4 fourth-pass operators:
incremental snapshot dedup (x46), sequence packing (x47), and
quality-weighted sampling (x48).  Oracle parity for all three is covered
by test_oracle.py's registry sweep; these pin the semantics and the scale
properties."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from conecta_spark.functions.sampling import (
    hash_bucket,
    quality_weighted_sample,
    sequence_pack,
)
from conecta_spark.operators.dedup import incremental_dedup
from conecta_spark.queries import REGISTRY, _load_extensions

from .test_plans import plan

_load_extensions()


# -- x46 incremental dedup ---------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, source=s) for i, t, s in rows]
    )


def test_incremental_dedup_drops_known_content_keeps_novel(spark):
    snapshot = _docs(spark, [(0, "seen before", "a"), (2, "also seen", "a")])
    batch = _docs(
        spark,
        [(11, "seen before", "b"), (13, "brand new", "b"), (15, "also seen", "c")],
    )
    out = incremental_dedup(batch, snapshot).collect()
    assert [(r.doc_id, r.source) for r in out] == [(13, "b")]


def test_incremental_dedup_is_content_not_id_based(spark):
    # Same ids on both sides must NOT matter; only text content does.
    snapshot = _docs(spark, [(1, "alpha", "a")])
    batch = _docs(spark, [(1, "beta", "b")])
    assert incremental_dedup(batch, snapshot).count() == 1


def test_incremental_dedup_accepts_prehashed_snapshot_index(spark):
    # A production system stores the hash index, not the text: a snapshot
    # relation that already has an ``h`` column is used as-is.
    snapshot = _docs(spark, [(0, "seen before", "a")]).select(
        F.sha2(F.col("text"), 256).alias("h")
    )
    batch = _docs(spark, [(11, "seen before", "b"), (13, "new", "b")])
    out = incremental_dedup(batch, snapshot).collect()
    assert [r.doc_id for r in out] == [13]


def test_incremental_dedup_anti_join_never_shuffles_text(spark, oracle_dir):
    p = plan(REGISTRY["x46_incremental_dedup"].fn(spark, oracle_dir))
    # Anti-join semantics on the hash, and no Exchange row carries the text
    # column -- it must die in the scan-stage projection on both sides.
    assert "LeftAnti" in p
    for ln in p.splitlines():
        if "Arguments" in ln and "Exchange" in ln:
            assert "text" not in ln


# -- x47 sequence packing ----------------------------------------------------


def test_sequence_pack_chunks_at_boundary(spark):
    # 3 docs of 3 tokens in one (lang, shard) stream with seq_len=4:
    # start offsets 0, 3, 6 -> seq_ids 0, 0, 1.
    d = spark.createDataFrame(
        [Row(doc_id=i * 8, lang="en", text="a b c") for i in range(3)]
    )
    out = {
        r.doc_id: r.seq_id
        for r in sequence_pack(d, seq_len=4, shards=8).collect()
    }
    assert out == {0: 0, 8: 0, 16: 1}


def test_sequence_pack_streams_are_shard_independent(spark):
    # Docs in different shards pack independently: both start at offset 0.
    d = spark.createDataFrame(
        [Row(doc_id=0, lang="en", text="a b c"), Row(doc_id=1, lang="en", text="d e f")]
    )
    out = sequence_pack(d, seq_len=4, shards=8).collect()
    assert {r.seq_id for r in out} == {0}
    assert {r.shard for r in out} == {0, 1}


def test_sequence_pack_single_window_shuffle(spark, oracle_dir):
    p = plan(REGISTRY["x47_sequence_pack"].fn(spark, oracle_dir))
    from .test_plans import node_count

    assert node_count(p, "Exchange") == 1
    assert node_count(p, "Window") == 1


# -- x48 quality-weighted sampling ------------------------------------------


def test_quality_weighted_keeps_good_drops_empty(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and the cat sat on the mat "
    ) * 8
    d = spark.createDataFrame(
        [Row(doc_id=i, text=good, source="good", n_chars=len(good)) for i in range(200)]
        + [Row(doc_id=1000 + i, text="", source="junk", n_chars=0) for i in range(200)]
    )
    out = {r.source: r.n_kept for r in quality_weighted_sample(d).collect()}
    # Perfect-quality English text scores exactly 1.0 -> every doc kept.
    assert out["good"] == 200
    # Empty docs score 0.304 (only the no-punctuation component fires), so
    # they survive at roughly that rate -- the sampler tracks the score.
    assert 30 <= out.get("junk", 0) <= 95


def test_quality_weighted_is_deterministic(spark, oracle_dir):
    fn = REGISTRY["x48_quality_weighted_sample"].fn
    a = sorted(map(tuple, fn(spark, oracle_dir).collect()))
    b = sorted(map(tuple, fn(spark, oracle_dir).collect()))
    assert a == b


def test_quality_weighted_zero_shuffle_before_aggregate(spark, oracle_dir):
    from .test_plans import node_count

    p = plan(REGISTRY["x48_quality_weighted_sample"].fn(spark, oracle_dir))
    # One exchange total: the final per-source aggregate.  The quality gate
    # itself is a scan-stage filter.
    assert node_count(p, "Exchange") == 1


def test_hash_bucket_matches_registered_semantics(spark):
    # The survival predicate reuses the x27 portable hash: spot-check the
    # first few buckets against the documented integer formula.
    rows = (
        spark.range(5)
        .select(hash_bucket("id", 10_000).alias("b"))
        .collect()
    )
    MOD, MIX = 1_000_000_007, 2654435761
    assert [r.b for r in rows] == [(i % MOD) * MIX % MOD % 10_000 for i in range(5)]


# -- x49 filtered vector search ---------------------------------------------


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs]
    )


def test_filtered_knn_excludes_filtered_out_nearest(spark):
    from conecta_spark.operators.simsearch import filtered_knn

    # vec 1 is identical to the query (cosine 1.0) but its doc fails the
    # filter; vec 2 is orthogonal-ish but allowed.
    base = [1.0] + [0.0] * 63
    other = [0.0, 1.0] + [0.0] * 62
    emb = _emb(spark, [(0, base), (1, base), (2, other)])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="de", n_chars=500),
            Row(doc_id=2, lang="en", n_chars=500),
        ]
    )
    out = filtered_knn(
        emb, docs, (F.col("lang") == "en") & (F.col("n_chars") >= 200), k=5
    ).collect()
    assert [r.vec_id for r in out] == [2]


def test_filtered_knn_query_exempt_from_its_own_filter(spark):
    from conecta_spark.operators.simsearch import filtered_knn

    base = [1.0] + [0.0] * 63
    emb = _emb(spark, [(0, base), (1, base)])
    # The query doc (0) fails the filter; the search must still run,
    # anchored on its vector, and return the allowed neighbor.
    docs = spark.createDataFrame(
        [Row(doc_id=0, lang="de", n_chars=10), Row(doc_id=1, lang="en", n_chars=500)]
    )
    out = filtered_knn(emb, docs, F.col("lang") == "en", k=5).collect()
    assert [r.vec_id for r in out] == [1]


def test_filtered_knn_plan_heap_topk_and_pruned_doc_scan(spark, oracle_dir):
    p = plan(REGISTRY["x49_filtered_knn"].fn(spark, oracle_dir))
    assert "TakeOrderedAndProject" in p
    # The documents side must read only the id + predicate columns.
    doc_reads = [
        ln for ln in p.splitlines() if "ReadSchema" in ln and "lang" in ln
    ]
    assert doc_reads and all("text" not in ln for ln in doc_reads)


# -- x50 canonical-doc selection --------------------------------------------


def test_keep_best_picks_highest_quality_then_lowest_id(spark):
    from conecta_spark.operators.cluster import keep_best_per_cluster

    good = (
        "the quick brown fox jumps over the lazy dog and the cat sat on it "
    ) * 8
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="!!!"),          # junk member
            Row(doc_id=2, text=good),           # best member of cluster 1
            Row(doc_id=7, text=good),           # tied members of cluster 5:
            Row(doc_id=5, text=good),           # min id 5 must win the tie
        ]
    )
    clusters = spark.createDataFrame(
        [
            Row(doc_id=1, cluster_id=1),
            Row(doc_id=2, cluster_id=1),
            Row(doc_id=5, cluster_id=5),
            Row(doc_id=7, cluster_id=5),
        ]
    )
    out = {
        r.cluster_id: (r.kept_doc, r.n_members)
        for r in keep_best_per_cluster(docs, clusters).collect()
    }
    assert out == {1: (2, 2), 5: (5, 2)}


def test_keep_best_text_never_enters_the_cluster_window(spark, oracle_dir):
    p = plan(REGISTRY["x50_keep_best_per_cluster"].fn(spark, oracle_dir))
    for ln in p.splitlines():
        if "Exchange" in ln and "Arguments" in ln:
            assert "text" not in ln


def test_keep_best_survives_one_giant_cluster(spark):
    """Degenerate threshold: a threshold low enough (or a corpus
    adversarial enough) collapses the whole corpus into ONE component.
    A rank window over cluster_id would funnel every row through a
    single task; keep_best must instead reduce via partially-combined
    aggregation so per-task input stays bounded however large a cluster
    grows (the r4 verdict's one unprotected hot key)."""
    from conecta_spark.operators.cluster import keep_best_per_cluster

    n = 50_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("some reasonable document text number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    giant = docs.select("doc_id", F.lit(0).alias("cluster_id"))
    out = keep_best_per_cluster(docs, giant)

    p = plan(out)
    assert "Window" not in p, "rank window funnels the giant cluster"
    assert "partial" in p.lower(), "reduction must combine map-side"

    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].n_members == n
    # every text scores identically here, so the lowest id wins the tie
    assert rows[0].kept_doc == 0


def test_keep_best_non_numeric_ids_match_numeric_semantics(spark):
    """The string-id fallback (max-q + tie join-back + min-id) must pick
    the same winners as the numeric single-aggregate path."""
    from conecta_spark.operators.cluster import keep_best_per_cluster

    good = ("the quick brown fox jumps over the lazy dog again and " * 8)
    docs = spark.createDataFrame(
        [
            Row(doc_id="d1", text="!!!"),
            Row(doc_id="d2", text=good),
            Row(doc_id="d7", text=good),
            Row(doc_id="d5", text=good),
        ]
    )
    clusters = spark.createDataFrame(
        [
            Row(doc_id="d1", cluster_id="c1"),
            Row(doc_id="d2", cluster_id="c1"),
            Row(doc_id="d5", cluster_id="c5"),
            Row(doc_id="d7", cluster_id="c5"),
        ]
    )
    out = {
        r.cluster_id: (r.kept_doc, r.n_members)
        for r in keep_best_per_cluster(docs, clusters).collect()
    }
    assert out == {"c1": ("d2", 2), "c5": ("d5", 2)}


# -- span_hashes materialization (quadratic-regression pin) ------------------


def test_span_hashes_splits_text_exactly_once(spark):
    """The word split must be materialized in its own projection, not
    re-evaluated inside the span lambda: higher-order functions are
    interpreted and CSE does not reach into them, so an inlined split is
    O(spans * doc_length) -- measured 36 s for one 50k-word document.
    Pinned via the optimized plan: exactly one split() call."""
    from conecta_spark.operators.dedup import span_hashes

    d = spark.createDataFrame([Row(doc_id=1, text="a b c d e f g h i j")])
    df = span_hashes(d)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("split(") == 1, optimized

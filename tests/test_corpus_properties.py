"""Property-based invariants for the corpus-assembly operators (hypothesis
with a Python reference model; few examples -- each runs real Spark jobs).

* sequence_pack: seq assignment equals the reference greedy packer on any
  token distribution; streams are independent; no doc is lost or invented.
* incremental_dedup: output is exactly the batch rows whose content is
  absent from the snapshot, regardless of id collisions or duplicates.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from conecta_spark.functions.sampling import sequence_pack
from conecta_spark.operators.dedup import incremental_dedup

texts = st.lists(
    st.integers(min_value=0, max_value=12),  # token counts per doc
    min_size=1,
    max_size=24,
)


@given(toks=texts, seq_len=st.integers(min_value=1, max_value=16))
@settings(max_examples=8, deadline=None)
def test_sequence_pack_matches_reference_packer(spark, toks, seq_len):
    docs = [
        Row(doc_id=i, lang="en", text=" ".join(["w"] * n) if n else "")
        for i, n in enumerate(toks)
    ]
    out = {
        r.doc_id: (r.shard, r.n_tok, r.seq_id)
        for r in sequence_pack(
            spark.createDataFrame(docs), seq_len=seq_len, shards=4
        ).collect()
    }
    # reference: per (shard) stream in doc_id order, seq = start // seq_len
    assert set(out) == set(range(len(toks))), "docs lost or invented"
    offsets: dict[int, int] = {}
    for i, n in enumerate(toks):
        shard = i % 4
        start = offsets.get(shard, 0)
        assert out[i] == (shard, n, start // seq_len), (i, out[i])
        offsets[shard] = start + n


corpus = st.lists(st.text(alphabet="abc", max_size=3), min_size=0, max_size=12)


@given(snap=corpus, batch=corpus)
@settings(max_examples=8, deadline=None)
def test_incremental_dedup_is_set_difference_on_content(spark, snap, batch):
    mk = lambda rows, off: [
        Row(doc_id=off + i, text=t, source="s") for i, t in enumerate(rows)
    ]
    schema = "doc_id long, text string, source string"
    sdf = spark.createDataFrame(mk(snap, 0), schema)
    bdf = spark.createDataFrame(mk(batch, 1000), schema)
    got = sorted(r.doc_id for r in incremental_dedup(bdf, sdf).collect())
    want = sorted(
        1000 + i for i, t in enumerate(batch) if t not in set(snap)
    )
    assert got == want


dup_corpus = st.lists(
    st.integers(min_value=0, max_value=2**32),  # doc seeds
    min_size=3,
    max_size=10,
    unique=True,
)


@given(seeds=dup_corpus)
@settings(max_examples=6, deadline=None)
def test_minhash_lsh_always_finds_planted_exact_clones(spark, seeds):
    """Identical documents produce identical signatures, land in the same
    band buckets, and verify at jaccard 1.0 -- so with the boilerplate
    filter out of the way (max_df=1.0), EVERY planted clone pair must be
    recalled, whatever else is in the corpus.  (Near-dup recall below 1.0
    is inherent to LSH banding; exact-clone recall is not allowed to be.
    The default max_df interacts with corpus SIZE, not LSH -- see the
    companion test below.)"""
    from conecta_spark.operators.dedup import minhash_lsh_pairs

    # distinctive pseudo-random texts derived from seeds; clone the first
    # two documents under high ids
    texts = {
        i: " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for i, s in enumerate(seeds)
    }
    rows = [Row(doc_id=i, text=t) for i, t in texts.items()]
    rows += [
        Row(doc_id=100, text=texts[0]),
        Row(doc_id=101, text=texts[1]),
    ]
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows), max_df=1.0
        ).collect()
    }
    assert (0, 100) in pairs
    assert (1, 101) in pairs


def test_incremental_near_dup_equals_filtered_standing_miner(spark):
    """x73's defining identity: incremental_minhash_pairs(corpus, new)
    must equal minhash_lsh_pairs(corpus UNION new) restricted to pairs
    with at least one side in the new batch -- same pairs, same verified
    jaccard values -- and must emit NO corpus-internal pair.  Planted
    layout: clones spanning sides (corpus doc 0 == new doc 100), clones
    within the new batch (101 == 102), and a corpus-internal clone pair
    (1 == 50) that the standing miner finds but the incremental one must
    not re-mine."""
    from conecta_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    texts = {
        i: " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for i, s in enumerate((7, 13, 29, 41, 53, 67))
    }
    corpus_rows = [Row(doc_id=i, text=t) for i, t in texts.items()]
    corpus_rows += [Row(doc_id=50, text=texts[1])]  # corpus-internal clone
    new_rows = [
        Row(doc_id=100, text=texts[0]),   # cross-side clone
        Row(doc_id=101, text=texts[2]),   # cross-side clone
        Row(doc_id=102, text=texts[2]),   # new-internal clone (with 101)
    ]
    corpus = spark.createDataFrame(corpus_rows)
    new = spark.createDataFrame(new_rows)

    inc = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in incremental_minhash_pairs(corpus, new, max_df=1.0).collect()
    }
    new_ids = {100, 101, 102}
    full = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(
            corpus.unionByName(new), max_df=1.0
        ).collect()
    }
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert inc == want
    # the planted shapes all present ...
    got_pairs = {(a, b) for a, b, _ in inc}
    assert {(0, 100), (2, 101), (2, 102), (101, 102)} <= got_pairs
    # ... and the corpus-internal pair mined by the standing miner is
    # genuinely excluded, not absent from the corpus
    assert (1, 50) in {(a, b) for a, b, _ in full}
    assert (1, 50) not in got_pairs


def test_mining_probe_prices_the_actual_candidate_volume(spark):
    """x74's integral sum(w*(w-1)/2) over band-bucket widths must equal
    the RAW (pre-distinct) pair count the band self-join would generate
    -- recomputed here directly from the banded relation -- and the
    capped variants must equal the same sum restricted to under-cap
    buckets.  This is the identity that lets the probe price a mine
    without running it."""
    from pyspark.sql import functions as F

    from conecta_spark.operators.dedup import (
        _mine_banded,
        minhash_candidate_probe,
    )

    texts = {
        i: " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for i, s in enumerate((7, 13, 29, 41, 53))
    }
    rows = [Row(doc_id=i, text=t) for i, t in texts.items()]
    # clones widen buckets so the integral is non-trivial
    rows += [Row(doc_id=100 + i, text=texts[0]) for i in range(3)]
    rows += [Row(doc_id=200, text=texts[1])]
    df = spark.createDataFrame(rows)

    probe = minhash_candidate_probe(df, caps=(2, 3), max_df=1.0).first()

    _, banded, _ = _mine_banded(
        df, 5, 16, 4, "text", "doc_id", 1.0, False, None
    )
    a, b = banded.alias("a"), banded.alias("b")
    raw = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert probe.raw_uncapped == raw and raw > 0

    w = banded.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("w")
    )
    for cap in (2, 3):
        capped = (
            w.where(F.col("w") <= cap)
            .agg(F.sum(F.expr("w * (w - 1) DIV 2")))
            .first()[0]
            or 0
        )
        assert probe[f"raw_cap{cap}"] == capped
    assert probe.raw_cap2 <= probe.raw_cap3 <= probe.raw_uncapped


@given(seeds=dup_corpus, cut_frac=st.integers(min_value=2, max_value=8))
@settings(max_examples=5, deadline=None)
def test_incremental_equals_filtered_full_on_random_corpora(
    spark, seeds, cut_frac
):
    """Hypothesis form of the x73 identity: for ANY corpus and ANY id
    split point, incremental_minhash_pairs(corpus, new) must equal
    minhash_lsh_pairs(union) filtered to at-least-one-new -- same pairs,
    same verified jaccard.  Random seed corpora with planted clones on
    both sides of the cut exercise cross, new-internal, and
    corpus-internal pair shapes."""
    from conecta_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    texts = {
        i: " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for i, s in enumerate(seeds)
    }
    rows = [Row(doc_id=i, text=t) for i, t in texts.items()]
    # clones: one pair inside the low range, one clone under a high id
    rows += [Row(doc_id=50, text=texts[0]), Row(doc_id=100, text=texts[1])]
    df = spark.createDataFrame(rows)
    cut = max(len(seeds) * cut_frac // 8, 1)
    new = df.where(f"doc_id >= {cut}")
    corpus = df.where(f"doc_id < {cut}")

    inc = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in incremental_minhash_pairs(corpus, new, max_df=1.0).collect()
    }
    full = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(df, max_df=1.0).collect()
    }
    want = {p for p in full if p[0] >= cut or p[1] >= cut}
    assert inc == want


@given(seeds=dup_corpus, cap=st.integers(min_value=1, max_value=5))
@settings(max_examples=5, deadline=None)
def test_probe_integral_equals_join_count_on_random_corpora(
    spark, seeds, cap
):
    """Hypothesis form of the x74 identity: on ANY corpus and ANY cap,
    the probe's width-histogram integral must equal the band self-join's
    raw pre-distinct pair count, and the capped column must equal the
    integral restricted to under-cap buckets."""
    from pyspark.sql import functions as F

    from conecta_spark.operators.dedup import (
        _mine_banded,
        minhash_candidate_probe,
    )

    texts = {
        i: " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for i, s in enumerate(seeds)
    }
    rows = [Row(doc_id=i, text=t) for i, t in texts.items()]
    rows += [Row(doc_id=100 + i, text=texts[0]) for i in range(2)]
    df = spark.createDataFrame(rows)

    probe = minhash_candidate_probe(df, caps=(cap,), max_df=1.0).first()

    _, banded, _ = _mine_banded(
        df, 5, 16, 4, "text", "doc_id", 1.0, False, None
    )
    a, b = banded.alias("a"), banded.alias("b")
    raw = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    assert probe.raw_uncapped == raw
    w = banded.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("w")
    )
    capped = (
        w.where(F.col("w") <= cap)
        .agg(F.sum(F.expr("w * (w - 1) DIV 2")))
        .first()[0]
        or 0
    )
    assert probe[f"raw_cap{cap}"] == capped


def test_default_max_df_drops_clones_in_tiny_corpora_by_design(spark):
    """Documented trade-off, pinned so it stays deliberate: with the
    default max_df=0.1, a clone pair in a 7-doc corpus puts every shared
    shingle at 2/7 > 10% document frequency -- all its shingles count as
    boilerplate, the docs are dropped before banding, and the pair is NOT
    recalled.  At production corpus sizes (2/n << max_df) the filter only
    removes genuine template text; this is the tiny-corpus edge of that
    dial, not an LSH recall failure (the hypothesis property above shows
    recall is perfect with the filter open)."""
    from conecta_spark.operators.dedup import minhash_lsh_pairs

    texts = [
        " ".join(f"w{(s * (j + 3)) % 9973}" for j in range(30))
        for s in (11, 22, 33, 44, 55)
    ]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    rows += [Row(doc_id=100, text=texts[0])]
    pairs = minhash_lsh_pairs(spark.createDataFrame(rows)).collect()
    assert pairs == []


def test_span_scrub_matches_reference_first_occurrence_rule(spark):
    """span_scrub against a literal-text reference implementation of the
    C4 rule (count spans corpus-wide, keep only the first occurrence of
    any span seen >= 2 times, rebuild): random small-alphabet corpora
    force heavy span collision, including within one document."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from conecta_spark.operators.dedup import span_scrub

    K = 4  # span width for the test (operator default is 8)

    def reference(texts):
        spans = []  # (doc_i, idx, tuple_of_words)
        for di, text in enumerate(texts):
            ws = text.split(" ")
            for idx, s in enumerate(range(0, len(ws), K)):
                spans.append((di, idx, tuple(ws[s : s + K])))
        count = defaultdict(int)
        first = {}
        for di, idx, sp in spans:
            count[sp] += 1
            if sp not in first or (di, idx) < first[sp]:
                first[sp] = (di, idx)
        out = {}
        for di, text in enumerate(texts):
            ws = text.split(" ")
            kept, dropped = [], 0
            for idx, s in enumerate(range(0, len(ws), K)):
                sp = tuple(ws[s : s + K])
                if count[sp] >= 2 and first[sp] != (di, idx):
                    dropped += 1
                else:
                    kept.extend(sp)
            out[di] = (dropped, " ".join(kept))
        return out

    word = st.sampled_from(["aa", "bb", "cc"])
    doc = st.lists(word, min_size=1, max_size=12).map(" ".join)

    @given(st.lists(doc, min_size=1, max_size=5))
    @settings(max_examples=12, deadline=None)
    def check(texts):
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        got = {
            r.doc_id: (r.n_dropped, r.clean_text)
            for r in span_scrub(df, span_words=K).collect()
        }
        assert got == reference(texts)

    check()


# --- connected components vs a pure-Python union-find reference ---------

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),
        st.integers(min_value=0, max_value=25),
    ),
    min_size=1,
    max_size=30,
)


def _uf_reference(pairs):
    """Union-find over the vertices appearing in ``pairs``; cluster id is
    the component's minimum vertex (the operator's documented contract)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for v in parent:
        roots.setdefault(find(v), []).append(v)
    return {
        (v, min(members)) for members in roots.values() for v in members
    }


@given(pairs=_edges)
@settings(max_examples=6, deadline=None)
def test_connected_components_match_union_find_on_random_graphs(spark, pairs):
    """Both CC branches must equal the Python union-find reference on
    arbitrary graphs -- self-loops, parallel edges, reversed duplicates,
    multi-component tangles.  The fixed-graph tests pin known shapes;
    this pins the general contract (labels are the component MIN, every
    edge-listed vertex appears exactly once)."""
    from pyspark.sql import Row

    from conecta_spark.operators.cluster import connected_components

    expect = _uf_reference(pairs)
    edges = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs]
    )
    got_uf = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(edges).collect()
    }
    assert got_uf == expect, "driver union-find branch diverged"
    got_lp = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(
            edges, small_graph_threshold=0
        ).collect()
    }
    assert got_lp == expect, "label-propagation branch diverged"


# --- as-of join vs a pure-Python nearest-row reference -------------------

_stream = st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=10)


@given(lts=_stream, rts=_stream.map(lambda xs: sorted(set(xs))))
@settings(max_examples=6, deadline=None)
def test_asof_join_matches_reference_both_directions(spark, lts, rts):
    """asof_join must equal the obvious Python scan on arbitrary
    timestamp multisets (duplicate left timestamps, exact ties with the
    right side, left rows before/after the whole right stream).  Right
    timestamps are deduped per the documented uniqueness precondition."""
    from pyspark.sql import Row

    from conecta_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [Row(k="a", tsu=t, lid=i) for i, t in enumerate(lts)]
    )
    right = spark.createDataFrame(
        [Row(k="a", tsu=t, rval=t * 10) for t in rts],
        "k string, tsu long, rval long",
    )
    for direction in ("backward", "forward"):
        got = {
            r.lid: r.rval
            for r in asof_join(
                left, right, by="k", direction=direction
            ).collect()
        }
        for i, t in enumerate(lts):
            pool = [x for x in rts if (x <= t if direction == "backward" else x >= t)]
            want = (
                (max(pool) if direction == "backward" else min(pool)) * 10
                if pool
                else None
            )
            assert got.get(i) == want, (direction, i, t, got.get(i), want)


# --- sessionization vs a pure-Python gap-scan reference -------------------

# Seconds drawn from multiples of 900 so consecutive gaps frequently land
# EXACTLY on the 1800 s session gap (the rule is strictly-greater: an
# exact-gap event continues the session), plus duplicate timestamps.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user_id
        st.integers(min_value=0, max_value=40),  # ts = n * 900 s
    ),
    min_size=1,
    max_size=20,
)


@given(evs=_events)
@settings(max_examples=6, deadline=None)
def test_sessionize_batch_matches_reference_scan(spark, evs):
    """sessionize_batch must equal the obvious per-user sorted gap scan on
    arbitrary event streams: duplicate timestamps (tie-broken by
    event_id, gap 0 -- always same session), exact-boundary gaps (1800 s
    == gap continues the session, the > rule), interleaved users."""
    import datetime

    from pyspark.sql import Row

    from conecta_spark.streaming.events import SESSION_GAP_US, sessionize_batch

    rows = [
        Row(
            user_id=u,
            event_id=i,
            ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s * 900),
        )
        for i, (u, s) in enumerate(evs)
    ]
    got = {
        (r.user_id, r.n_events, r.start_us, r.end_us, r.duration_us)
        for r in sessionize_batch(spark.createDataFrame(rows)).collect()
    }

    base_us = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
        * 1_000_000
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(evs):
        by_user.setdefault(u, []).append((base_us + s * 900 * 1_000_000, i))
    expect = set()
    for u, lst in by_user.items():
        lst.sort()
        sessions, cur = [], [lst[0]]
        for p in lst[1:]:
            if p[0] - cur[-1][0] > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(p)
        sessions.append(cur)
        for sess in sessions:
            ts = [t for t, _ in sess]
            expect.add((u, len(sess), min(ts), max(ts), max(ts) - min(ts)))
    assert got == expect


@given(evs=_events)
@settings(max_examples=6, deadline=None)
def test_session_window_matches_reference_scan(spark, evs):
    """Spark's native session_window aggregation (the x72 mechanism) must
    equal the same pure-Python gap scan as sessionize_batch, with session
    end = last event + gap: duplicate timestamps (gap 0), exact-boundary
    gaps (an event at exactly prev+gap MERGES -- end-inclusive, identical
    to the batch > rule), interleaved users."""
    import datetime

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from conecta_spark.streaming.events import SESSION_GAP_US

    rows = [
        Row(
            user_id=u,
            ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s * 900),
        )
        for u, s in evs
    ]
    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in spark.createDataFrame(rows)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
        .collect()
    }

    base_us = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
        * 1_000_000
    )
    by_user: dict[int, list[int]] = {}
    for u, s in evs:
        by_user.setdefault(u, []).append(base_us + s * 900 * 1_000_000)
    expect = set()
    for u, lst in by_user.items():
        lst.sort()
        sessions, cur = [], [lst[0]]
        for t in lst[1:]:
            if t - cur[-1] > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(t)
        sessions.append(cur)
        for sess in sessions:
            expect.add((u, sess[0], sess[-1] + SESSION_GAP_US, len(sess)))
    assert got == expect


# --- interval join vs the all-pairs reference ------------------------------

_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),     # key
        st.integers(min_value=-25, max_value=25),  # ts (negatives pin the
    ),                                             # truncating-div bucketing)
    min_size=1,
    max_size=12,
)


@given(pts=_pts, anc=_pts)
@settings(max_examples=6, deadline=None)
def test_interval_join_matches_all_pairs_reference(spark, pts, anc):
    """interval_join's bucketed plan must equal the quadratic definition --
    every same-key pair with |p_ts - a_ts| <= radius, exactly once --
    including NEGATIVE timestamps (Spark's integer `div` truncates toward
    zero, widening bucket 0; the +-1 bucket span must still cover every
    qualifying pair) and exact-radius boundary pairs."""
    from pyspark.sql import Row

    from conecta_spark.operators.asof import interval_join

    radius = 7
    points = spark.createDataFrame(
        [Row(k=k, tsu=t) for k, t in pts], "k int, tsu long"
    )
    anchors = spark.createDataFrame(
        [Row(k=k, tsu=t) for k, t in anc], "k int, tsu long"
    )
    got = {
        (r.k, r.p_ts, r.a_ts)
        for r in interval_join(points, anchors, by="k", radius_us=radius).collect()
    }
    expect = {
        (k, pt, at)
        for k, pt in pts
        for k2, at in anc
        if k == k2 and abs(pt - at) <= radius
    }
    assert got == expect


# --- token budgeting vs the prefix-scan reference ---------------------------

_budget_docs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=9),  # whitespace tokens per doc
    ),
    min_size=1,
    max_size=16,
)


@given(docs=_budget_docs, budget=st.integers(min_value=0, max_value=20))
@settings(max_examples=8, deadline=None)
def test_token_budget_sample_matches_prefix_reference(spark, docs, budget):
    """token_budget_sample's audit must equal the obvious per-source
    id-ordered prefix scan -- zero-token documents (kept for free inside
    the prefix, dropped after the overflow point since the cumulative sum
    is already past budget), a first document alone exceeding the budget
    (source emits no audit row), and budget 0."""
    from pyspark.sql import Row

    from conecta_spark.functions.sampling import token_budget_sample

    df = spark.createDataFrame(
        [
            Row(doc_id=i, source=s, text=" ".join(["w"] * n))
            for i, (s, n) in enumerate(docs)
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r.source: (r.docs_kept, r.tokens_kept, r.budget_used)
        for r in token_budget_sample(df, budget=budget).collect()
    }

    expect = {}
    by_source: dict[str, list[tuple[int, int]]] = {}
    for i, (s, n) in enumerate(docs):
        by_source.setdefault(s, []).append((i, n))
    for s, lst in by_source.items():
        total = kept = toks = 0
        for _, n in sorted(lst):
            total += n
            if total > budget:
                break
            kept += 1
            toks += n
        if kept:
            expect[s] = (kept, toks, toks)
    assert got == expect


# --- span dedup vs the global span-counting reference -----------------------

_span_word = st.sampled_from(["aa", "bb"])
_span_docs = st.lists(
    st.lists(_span_word, min_size=1, max_size=7).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=_span_docs)
@settings(max_examples=8, deadline=None)
def test_span_dedup_stats_match_global_counting_reference(spark, texts):
    """span_dedup_stats must equal the obvious model: segment each doc's
    words into consecutive non-overlapping span_words windows (trailing
    span PARTIAL -- the r7 short-doc gram class), count every span's
    occurrences across the whole corpus as a MULTISET (intra-doc repeats
    each count), report per doc total spans and globally-duplicated
    spans.  The tiny two-word vocabulary forces heavy cross-doc span
    collisions."""
    from collections import Counter

    from pyspark.sql import Row

    from conecta_spark.operators.dedup import span_dedup_stats

    K = 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in span_dedup_stats(df, span_words=K).collect()
    }

    per_doc = {
        i: [
            " ".join(t.split(" ")[j : j + K])
            for j in range(0, len(t.split(" ")), K)
        ]
        for i, t in enumerate(texts)
    }
    counts = Counter(s for spans in per_doc.values() for s in spans)
    expect = {
        i: (len(spans), sum(1 for s in spans if counts[s] >= 2))
        for i, spans in per_doc.items()
    }
    assert got == expect


@given(texts=_span_docs)
@settings(max_examples=8, deadline=None)
def test_span_novelty_matches_first_owner_reference(spark, texts):
    """span_novelty must equal the model: a span occurrence is novel iff
    its document is the MINIMUM doc_id owning that span anywhere in the
    corpus (so every occurrence inside the first owner counts novel,
    including intra-doc repeats; later owners score zero for it)."""
    from pyspark.sql import Row

    from conecta_spark.operators.dedup import span_novelty

    K = 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.n_spans, r.novel_spans)
        for r in span_novelty(df, span_words=K).collect()
    }

    per_doc = {
        i: [
            " ".join(t.split(" ")[j : j + K])
            for j in range(0, len(t.split(" ")), K)
        ]
        for i, t in enumerate(texts)
    }
    first_owner: dict[str, int] = {}
    for i in sorted(per_doc):
        for s in per_doc[i]:
            first_owner.setdefault(s, i)
    expect = {
        i: (len(spans), sum(1 for s in spans if first_owner[s] == i))
        for i, spans in per_doc.items()
    }
    assert got == expect


# --- passage chunking vs the sliding-window reference -----------------------

_chunk_docs = st.lists(
    st.lists(st.sampled_from(["x", "yy"]), min_size=1, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=4,
)


@given(texts=_chunk_docs)
@settings(max_examples=8, deadline=None)
def test_passage_chunks_match_sliding_window_reference(spark, texts):
    """passage_chunks must equal the model: starts at 1, 1+stride, ... up
    to max(n_words, 1); each chunk is the next chunk_tokens words clamped
    at the document end (trailing starts yield short sub-window chunks --
    the documented clamp); chunk_id = (start-1) // stride."""
    from pyspark.sql import Row

    from conecta_spark.functions.text import passage_chunks

    CT, STRIDE = 4, 3
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
        for r in passage_chunks(df, chunk_tokens=CT, stride=STRIDE).collect()
    }

    expect = set()
    for i, t in enumerate(texts):
        ws = t.split(" ")
        for s in range(1, max(len(ws), 1) + 1, STRIDE):
            piece = ws[s - 1 : s - 1 + CT]
            expect.add((i, (s - 1) // STRIDE, len(piece), " ".join(piece)))
    assert got == expect


# --- exact percentiles vs the numpy linear-interpolation reference ----------

_vals = st.lists(
    st.integers(min_value=-100, max_value=100), min_size=1, max_size=15
)


@given(a=_vals, b=_vals)
@settings(max_examples=8, deadline=None)
def test_exact_percentiles_match_numpy_linear(spark, a, b):
    """Spark's `percentile` must agree with numpy's linear-interpolation
    quantile on arbitrary multisets (single-element groups, duplicate
    values, negatives) -- the interpolation convention is exactly what
    diverges across engines, and the DuckDB oracle (quantile_cont) pins
    the same convention from a third side."""
    import numpy as np
    from pyspark.sql import Row

    from conecta_spark.functions.stats import exact_percentiles

    rows = [Row(g="a", value=float(v)) for v in a] + [
        Row(g="b", value=float(v)) for v in b
    ]
    got = {
        r.g: (r.p5, r.p95)
        for r in exact_percentiles(
            spark.createDataFrame(rows), "value", ("g",), (0.5, 0.95)
        ).collect()
    }
    for g, vals in (("a", a), ("b", b)):
        want = (
            float(np.percentile(vals, 50, method="linear")),
            float(np.percentile(vals, 95, method="linear")),
        )
        assert got[g] == pytest.approx(want, rel=1e-12, abs=1e-12), (g, vals)


# --- corpus TF-IDF vs the Counter reference ---------------------------------

_tfidf_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=6).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


@given(texts=_tfidf_docs)
@settings(max_examples=8, deadline=None)
def test_tfidf_top_terms_match_counter_reference(spark, texts):
    """tfidf_top_terms must equal the model: tf = total occurrences, df =
    distinct owning docs, score = round(tf * ln(N/df), 6), ranked by
    (score desc, term) -- the log-base/smoothing convention is exactly
    what silently diverges between TF-IDF implementations.  k exceeds the
    3-term vocabulary so the whole ranking is compared, order included."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    from conecta_spark.functions.quality import tfidf_top_terms

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = [
        (r.w, r.tf, r.df, r.tfidf)
        for r in tfidf_top_terms(df, k=10).collect()
    ]

    n = len(texts)
    tf = Counter(w for t in texts for w in t.split(" "))
    docf = Counter(w for t in texts for w in set(t.split(" ")))
    expect = sorted(
        (
            (w, tf[w], docf[w], round(tf[w] * math.log(n / docf[w]), 6))
            for w in tf
        ),
        key=lambda r: (-r[3], r[0]),
    )
    assert got == expect


# --- token commonness + truncated-vocab OOV vs Counter references -----------

_qual_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_qual_docs)
@settings(max_examples=8, deadline=None)
def test_token_commonness_matches_counter_reference(spark, texts):
    """token_commonness must equal the model: per doc, mean corpus
    frequency of its tokens (exact integer sum, one double division);
    zero-token documents produce NO row (they explode to nothing)."""
    from collections import Counter

    from pyspark.sql import Row

    from conecta_spark.functions.quality import token_commonness

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.n_tok, r.mean_token_df)
        for r in token_commonness(df).collect()
    }

    counts = Counter(w for t in texts for w in t.split(" ") if w)
    expect = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        if ws:
            expect[i] = (len(ws), sum(counts[w] for w in ws) / len(ws))
    assert got == expect


@given(texts=_qual_docs)
@settings(max_examples=8, deadline=None)
def test_oov_stats_match_truncated_vocab_reference(spark, texts):
    """oov_stats must equal the model: vocab = top-V tokens by
    (count desc, token asc) -- V=2 against a 4-word alphabet so the
    truncation and its tie-break genuinely bite -- per doc n_tok, n_oov,
    and the mean corpus frequency of IN-vocab tokens (NULL when every
    token is OOV, including the zero-token doc)."""
    from collections import Counter

    from pyspark.sql import Row

    from conecta_spark.functions.quality import oov_stats

    V = 2
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: (r.n_tok, r.n_oov, r.mean_invocab_df)
        for r in oov_stats(df, vocab_size=V).collect()
    }

    counts = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {
        w: c
        for w, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    }
    expect = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        inv = [w for w in ws if w in vocab]
        expect[i] = (
            len(ws),
            len(ws) - len(inv),
            sum(vocab[w] for w in inv) / len(inv) if inv else None,
        )
    assert got == expect


# -- r9: signature-level reference models (r8 verdict task 4) ---------------
# The planted-clone tests above prove minhash/simhash find what they must;
# these prove the SIGNATURES THEMSELVES equal an independent pure-Python
# model (the short-doc-gram class showed both engines can agree on a wrong
# answer -- only a third, hand-rolled model catches that).

_shingle_sets = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=1_000_000_006),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


@given(sets=_shingle_sets)
@settings(max_examples=8, deadline=None)
def test_minhash_signatures_match_min_over_permutations_model(spark, sets):
    """Both MinHash backends (the vectorized numpy mapInPandas path and
    the SQL expr it claims value-identity with) must equal the direct
    model: coordinate p = min over shingle hashes h of
    ((2654435761*(p+1)) % MOD * h + p*p + 7) % MOD."""
    from pyspark.sql import functions as F

    from conecta_spark.operators.dedup import (
        MOD,
        minhash_expr,
        minhash_signatures,
    )

    P = 16
    model = {
        i: [
            min(((2654435761 * (p + 1)) % MOD * h + p * p + 7) % MOD
                for h in hs)
            for p in range(P)
        ]
        for i, hs in enumerate(sets)
    }
    df = spark.createDataFrame(
        [(i, hs) for i, hs in enumerate(sets)],
        "doc_id long, shf array<long>",
    )
    got_np = {
        r.doc_id: list(r.mh)
        for r in minhash_signatures(df, num_perms=P).collect()
    }
    got_expr = {
        r.doc_id: list(r.mh)
        for r in df.select(
            "doc_id", F.expr(minhash_expr("shf", P)).alias("mh")
        ).collect()
    }
    assert got_np == model
    assert got_expr == model


_token_docs = st.lists(
    st.lists(
        st.text(alphabet="abcxyz012", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_token_docs)
@settings(max_examples=8, deadline=None)
def test_simhash_signatures_match_bit_vote_model(spark, texts):
    """simhash_signatures must equal the reference bit-vote: per token a
    31-polyhash mod 1e9+7 of its characters, per bit b the sum of
    (2*bit_b(h) - 1) votes over tokens, bit set iff the vote is
    strictly positive."""
    import re

    from pyspark.sql import Row

    from conecta_spark.operators.dedup import SIMHASH_BITS
    from conecta_spark.functions.text import MOD

    def tok_hash(tk: str) -> int:
        acc = 0
        for ch in tk:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    def model(text: str) -> int:
        toks = re.split(r"\s+", text.strip().lower())
        hs = [tok_hash(tk) for tk in toks]
        sig = 0
        for b in range(SIMHASH_BITS):
            vote = sum(2 * ((h >> b) & 1) - 1 for h in hs)
            if vote > 0:
                sig |= 1 << b
        return sig

    from conecta_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: r.simhash for r in simhash_signatures(df).collect()
    }
    assert got == {i: model(t) for i, t in enumerate(texts)}


_split_rows = st.lists(
    st.text(alphabet="abngz", min_size=0, max_size=5),  # source names
    min_size=1,
    max_size=20,
)


@given(sources=_split_rows)
@settings(max_examples=8, deadline=None)
def test_source_disjoint_split_coverage_and_leakage_model(spark, sources):
    """source_disjoint_split: every input doc comes back exactly once
    (coverage), all docs of one source land in ONE split (the leakage
    guarantee), and the assignment equals the portable-hash reference
    (bucket = 31-fold of the source's chars mod 1e9+7, mod 100)."""
    from pyspark.sql import Row

    from conecta_spark.functions.sampling import MOD, source_disjoint_split

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, text="w") for i, s in enumerate(sources)]
    )
    rows = source_disjoint_split(df).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(sources)))

    def bucket(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc % 100

    for r in rows:
        b = bucket(sources[r.doc_id])
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r.split == want, (r.doc_id, sources[r.doc_id], b)
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, set()).add(r.split)
    assert all(len(v) == 1 for v in by_source.values()), by_source

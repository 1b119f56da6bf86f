"""Behavior tests for the third-wave round-4 operators: token budgeting
(x43), span novelty (x44), and the multimodal resize / feature-extraction
plumbing (x45 + helpers)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from conecta_spark.functions.sampling import token_budget_sample
from conecta_spark.multimodal.ops import (
    attach_payloads,
    extract_features,
    resize_images,
)
from conecta_spark.operators.dedup import span_novelty
from conecta_spark.queries import REGISTRY, _load_extensions

from .test_plans import plan

_load_extensions()


# ---------------------------------------------------------------------------
# x43 token budgeting
# ---------------------------------------------------------------------------


def test_token_budget_keeps_ordered_prefix(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, source="a", text="one two three"),          # 3 tok
            Row(doc_id=1, source="a", text="four five"),              # 2 tok
            Row(doc_id=2, source="a", text="six seven eight nine"),   # 4 tok
            Row(doc_id=3, source="b", text="a b c d e f g h i j"),    # 10 tok
        ]
    )
    out = {
        r.source: r for r in token_budget_sample(df, budget=5).collect()
    }
    # source a: docs 0 (cum 3) and 1 (cum 5) fit; doc 2 (cum 9) does not.
    assert out["a"].docs_kept == 2
    assert out["a"].tokens_kept == 5
    assert out["a"].budget_used == 5
    # source b: its first doc alone exceeds the budget -> nothing kept.
    assert "b" not in out


def test_token_budget_is_prefix_not_best_fit(spark):
    """A later small doc must NOT be pulled in after the budget is hit --
    the semantic is an ordered prefix, not bin packing."""
    df = spark.createDataFrame(
        [
            Row(doc_id=0, source="a", text="w1 w2 w3 w4"),  # 4 tok, cum 4
            Row(doc_id=1, source="a", text="w w w w w w"),  # 6 tok, cum 10
            Row(doc_id=2, source="a", text="tiny"),         # 1 tok, cum 11
        ]
    )
    out = token_budget_sample(df, budget=5).collect()[0]
    assert out.docs_kept == 1 and out.tokens_kept == 4


# ---------------------------------------------------------------------------
# x44 span novelty
# ---------------------------------------------------------------------------


def test_span_novelty_credits_first_owner_only(spark):
    span = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=span),
            Row(doc_id=1, text=span),  # re-crawl: nothing new
            Row(doc_id=2, text="fresh words appearing here for the first time"),
        ]
    )
    rows = {r.doc_id: r for r in span_novelty(df).collect()}
    assert rows[0].novel_spans == 1  # first owner
    assert rows[1].novel_spans == 0  # pure re-crawl
    assert rows[2].novel_spans == 1


def test_span_novelty_counts_both_copies_for_the_first_owner(spark):
    span = "a b c d e f g h"
    df = spark.createDataFrame([Row(doc_id=7, text=span + " " + span)])
    row = span_novelty(df).collect()[0]
    # both occurrences live in the first-owner doc
    assert row.n_spans == 2 and row.novel_spans == 2


def test_novelty_and_dedup_shuffle_only_hashes(spark, oracle_dir):
    p = plan(REGISTRY["x44_span_novelty"].fn(spark, oracle_dir))
    for ln in p.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln, ln


# ---------------------------------------------------------------------------
# x45 multimodal resize / features
# ---------------------------------------------------------------------------


def _payloads(spark, texts):
    return attach_payloads(
        spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
    )


def test_resize_bounds_longest_side_and_keeps_aspect(spark):
    # fake dims come from the first/last byte values: "x"*300 decodes to
    # 136x136 (scaled), "!" to 49x49 (under max_side, passes through)
    d = _payloads(spark, ["x" * 300, "!"])
    rows = {r.doc_id: r for r in resize_images(d, max_side=64).collect()}
    for r in rows.values():
        assert max(r.out_width, r.out_height) <= 64
        # exact integer scaling: out = in * num // den
        assert r.scale_den >= r.scale_num >= 1
    # small images pass through unscaled
    small = rows[1]
    assert (small.scale_num, small.scale_den) == (1, 1)


def test_resize_is_deterministic(spark):
    d = _payloads(spark, ["abc def ghi", "jkl"])
    a = sorted(map(tuple, resize_images(d).collect()))
    b = sorted(map(tuple, resize_images(d).collect()))
    assert a == b


def test_features_have_fixed_width_and_exact_projections(spark):
    d = _payloads(spark, ["some document text here", ""])
    rows = {r.doc_id: r for r in extract_features(d).collect()}
    for r in rows.values():
        assert len(r.feature_hex) == 32  # 16 bytes hex
    vec0 = bytes.fromhex(rows[0].feature_hex)
    assert rows[0].f_sum == sum(vec0)
    assert rows[0].f_norm2 == sum(v * v for v in vec0)
    # empty payload -> zero vector
    assert rows[1].f_sum == 0 and set(rows[1].feature_hex) == {"0"}

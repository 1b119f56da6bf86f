"""Behavior + plan tests for the edit-distance similarity join (x53).
Oracle parity is covered by the registry sweep; these pin the
deletion-neighborhood blocking's exactness at distance 1."""

from __future__ import annotations

import random
import string

from pyspark.sql import Row

from conecta_spark.operators.stringsim import edit_distance_join
from conecta_spark.queries import REGISTRY, _load_extensions

from .test_plans import plan

_load_extensions()


def _j(spark, names):
    df = spark.createDataFrame(
        [Row(id=i, s=s) for i, s in enumerate(names)]
    )
    return {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_join(df, "s", "id").collect()
    }


def test_edit_join_finds_each_edit_kind_once(spark):
    got = _j(
        spark,
        [
            "kitten",   # 0
            "mitten",   # 1: substitution           -> (0,1) dist 1
            "kittens",  # 2: insertion at the end   -> (0,2) dist 1
            "kitte",    # 3: deletion at the end    -> (0,3) dist 1
            "sitting",  # 4: distance 3 from kitten -> absent
            "kitten",   # 5: exact duplicate        -> (0,5) dist 0
        ],
    )
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(0, 3)] == 1
    assert got[(0, 5)] == 0
    assert not any(4 in p for p in got)


def test_edit_join_is_complete_vs_quadratic_reference(spark):
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(17)
    names = [
        "".join(rng.choice("ab") for _ in range(rng.randint(2, 5)))
        for _ in range(60)
    ]
    got = set(_j(spark, names))
    want = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _jd(spark, names, d):
    df = spark.createDataFrame(
        [Row(id=i, s=s) for i, s in enumerate(names)]
    )
    return {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_join(df, "s", "id", threshold=d).collect()
    }


def _brute(names, d):
    return {
        (i, j): _lev(names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= d
    }


def test_edit_join_d2_exact_vs_quadratic_reference(spark):
    """The q-gram prefix-filter path must be EXACT at d=2: the
    occurrence-index labeling and the short-string pool are the two
    places a subtle miss would hide (repeated grams, strings below the
    pigeonhole bound), so the corpus mixes both with a low-entropy
    alphabet that maximizes gram collisions."""
    rng = random.Random(23)
    names = [
        "".join(rng.choice("ab0") for _ in range(rng.randint(1, 9)))
        for _ in range(70)
    ]
    names += ["", "a", "0000", "00000", "ab00ab", "template0001",
              "template0012", "template9999"]
    assert _jd(spark, names, 2) == _brute(names, 2)


def test_edit_join_d3_exact_vs_quadratic_reference(spark):
    rng = random.Random(31)
    names = [
        "".join(rng.choice("xy") for _ in range(rng.randint(2, 12)))
        for _ in range(50)
    ]
    assert _jd(spark, names, 3) == _brute(names, 3)


def test_edit_join_d2_repeated_gram_occurrences(spark):
    """Occurrence-index labels: '0000000' vs '0000' is distance 3 (out),
    '000000' vs '0000' is distance 2 (in); all-same-gram strings are the
    worst case for a set-semantics prefix filter, which would dedupe the
    labels and lose the count information."""
    names = ["0000", "00000", "000000", "0000000", "00100100", "00010010"]
    assert _jd(spark, names, 2) == _brute(names, 2)


def test_edit_join_d2_sig_count_cap_valve(spark):
    """Skew valve at d=2: a serial-numbered template column concentrates
    candidates into hot (gram, occurrence) labels; the cap must bound
    the cohort, never invent a pair, and keep pairs that relate through
    rare labels."""
    rows = [Row(id=i, s=f"template{i:04d}") for i in range(80)]
    rows += [Row(id=200, s="unique-abcdef"), Row(id=201, s="unique-abcdXY")]
    df = spark.createDataFrame(rows)

    exact = edit_distance_join(df, "s", "id", threshold=2)
    capped = edit_distance_join(df, "s", "id", threshold=2, sig_count_cap=5)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert len(exact_pairs) > 100  # the template cohort is quadratic
    assert capped_pairs <= exact_pairs  # a subset, never an invention
    assert (200, 201) in capped_pairs  # rare-label pair survives
    assert len(capped_pairs) < len(exact_pairs) / 2


def test_edit_join_property_exact_on_random_corpora(spark):
    """Hypothesis sweep: the blocking scheme (pair-label prefixes, short
    pool, occurrence labeling) must equal the brute-force model on
    arbitrary small corpora -- low-entropy alphabets maximize gram
    collisions and duplicate grams, the two places a subtle miss hides."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.text(alphabet="ab0", min_size=0, max_size=8),
        min_size=2,
        max_size=14,
    )

    @given(names=corpus, d=st.integers(min_value=2, max_value=3))
    @settings(max_examples=10, deadline=None)
    def check(names, d):
        assert _jd(spark, names, d) == _brute(names, d)

    check()


def test_edit_join_plan_is_equi_join_only(spark, oracle_dir):
    for name in ("x53_edit_distance_join", "x66_edit_distance_join_d2"):
        p = plan(REGISTRY[name].fn(spark, oracle_dir))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_sig_count_cap_bounds_templated_blowup(spark):
    """A serial-numbered template column concentrates every string into a
    handful of shared-prefix deletion signatures; the cap must bound the
    candidate cohort while keeping pairs that relate through rare
    signatures."""
    from pyspark.sql import Row

    from conecta_spark.operators.stringsim import edit_distance_join

    # 60 strings "template0".."template59" differ only in the suffix:
    # deleting the final char maps template1x/template2x/... onto shared
    # signatures; plus two genuinely-close outliers.
    rows = [Row(id=i, s=f"template{i}") for i in range(60)]
    rows += [Row(id=100, s="unique-abc"), Row(id=101, s="unique-abX")]
    df = spark.createDataFrame(rows)

    exact = edit_distance_join(df, "s", "id")
    capped = edit_distance_join(df, "s", "id", sig_count_cap=3)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # the template cohort is quadratically related in the exact answer
    assert len(exact_pairs) > 40
    # capping keeps a subset, never an invention
    assert capped_pairs <= exact_pairs
    # the outlier pair relates through rare signatures and must survive
    assert (100, 101) in capped_pairs
    # and the quadratic cohort is actually bounded
    assert len(capped_pairs) < len(exact_pairs) / 2


def test_labeled_occurrences_pandas_matches_golden_expr(spark):
    """The O(L) Arrow-batched labeling must be value-identical to the
    golden O(L^2) SQL definition (_labeled_grams_expr) it replaced on
    the hot path -- repeated grams, unicode, and minimum-length strings
    included."""
    from pyspark.sql import functions as F

    from conecta_spark.operators.stringsim import (
        _labeled_grams_expr,
        _labeled_occurrences_pandas,
    )

    rows = [
        (1, "0000000"),       # one gram, many occurrences
        (2, "abcabcabc"),     # period-3 repeats
        (3, "ab"),            # exactly q grams at q=2 -> single gram
        (4, "naïve café"),   # multi-byte codepoints
        (5, "xyxyxyxyzzz"),
        (6, "a b a b a"),
    ]
    df = (
        spark.createDataFrame(rows, "id long, s string")
        .withColumn("len", F.length("s"))
    )
    golden = (
        df.select(
            "id", "len", F.explode(F.expr(_labeled_grams_expr("s", 2))).alias("gk")
        )
        .select("id", "len", F.col("gk.g").alias("g"), F.col("gk.k").alias("k"))
    )
    fast = _labeled_occurrences_pandas(df, 2)
    g = sorted(map(tuple, golden.collect()))
    f = sorted(map(tuple, fast.collect()))
    assert g == f


def test_gram_backends_agree_end_to_end(spark):
    """Both gram backends must produce the identical edit-distance join
    result (the backend only changes WHERE the labeling runs)."""
    from conecta_spark.operators.stringsim import edit_distance_join_qgram

    rows = [(i, f"Customer#{i:09d}") for i in range(1, 120)] + [
        (200, "a ridiculously longer string that exercises the gram tail"),
        (201, "a ridiculously longer string that exercises the gram tai1"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    a = sorted(
        map(tuple, edit_distance_join_qgram(df, "s", "id", 2).collect())
    )
    b = sorted(
        map(
            tuple,
            edit_distance_join_qgram(
                df, "s", "id", 2, gram_backend="pandas"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_gram_backend_auto_resolution(spark, sf_dir):
    """auto must pick the measured-crossover side per corpus: expr for
    key-like strings (customer names, L~18 -- the Arrow toll loses) and
    pandas for document-length strings (L~2000 -- the O(L^2) interpreted
    occurrence scan loses 54x).  Pins the default so neither corpus ever
    silently lands on its slow path."""
    from pyspark.sql import functions as F

    from conecta_spark.operators.stringsim import _resolve_gram_backend
    from conecta_spark.queries import t

    names = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    ).withColumn("len", F.length("s"))
    assert _resolve_gram_backend(names) == "expr"

    texts = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("text").alias("s")
    ).withColumn("len", F.length("s"))
    assert _resolve_gram_backend(texts) == "pandas"

"""String similarity join under edit distance, Spark-first.

Literature context: string-similarity search/join over filtered indexes
is its own line of work (ICDE 2022, PAPERS.md).  The family's shape is
always signature -> equi-join -> verify; this module implements the
deletion-neighborhood (symmetric-delete) scheme for distance 1:

  edit(a, b) <= 1  <=>  del1(a) and del1(b) intersect,

where ``del1(s)`` is s itself plus every single-character deletion of s.
That makes candidate generation a pure EQUI-join on signature strings --
L+1 skinny rows per string, no theta-join, no cartesian -- followed by an
exact ``levenshtein() <= 1`` verification of the candidate pairs (both
engines implement classic Levenshtein, so the oracle can verify with the
same function).

Scale notes (100 TB): signatures are fixed small multiples of string
length and shuffle as (signature-hash, id) pairs; the verify join
re-attaches the two strings by id.  Popular signatures (shared prefixes
across a column of templated strings) concentrate candidates exactly
like LSH band buckets -- the same diagnosis applies (bucket-size audit),
and for higher thresholds the deletion neighborhood grows O(L^d); past
d=1 switch to q-gram count filtering, which trades signature volume for
a post-join count bound.  The oracle keeps the quadratic all-pairs
levenshtein join as the semantic contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import register, t


def _del1_signatures_expr(col: str) -> str:
    """Spark SQL array: ``col`` plus every single-character deletion."""
    return (
        f"transform(sequence(0, length({col})), j -> "
        f"CASE WHEN j = 0 THEN {col} "
        f"ELSE concat(substring({col}, 1, j - 1), "
        f"substring({col}, j + 1, length({col}))) END)"
    )


def edit_distance_join(
    df: DataFrame,
    string_col: str,
    id_col: str,
    threshold: int = 1,
    sig_count_cap: int | None = None,
) -> DataFrame:
    """``(id_a, id_b, dist)`` for all pairs with edit distance <=
    ``threshold`` (currently 1: the deletion-neighborhood property this
    blocking relies on is exact for d=1).

    ``sig_count_cap`` is the skew valve: a signature shared by c strings
    produces ~c^2/2 candidate pairs, so a templated column (serial-
    numbered names, boilerplate prefixes) concentrates quadratic work in
    a few buckets exactly like a hot LSH band.  With the cap set,
    signatures held by more than ``sig_count_cap`` strings are dropped
    BEFORE the self-join (one partial-aggregated count over the skinny
    signature relation -- the x07 document-frequency filter, same
    diagnosis, same medicine).  The trade is explicit: pairs related
    ONLY through a dropped signature are missed, so the default (None)
    stays exact; set the cap when a bucket audit shows cohort blowup,
    because a popular signature's cohort is precisely the part of the
    answer that is quadratically large no matter the algorithm."""
    if threshold != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for threshold=1; "
            "use q-gram count filtering for larger thresholds"
        )
    sigs = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.expr(_del1_signatures_expr(string_col)))
        ).alias("sig"),
        # Both self-join sides replan this projection independently (AQE
        # never reuses exchanges across them -- the x07/x54 lesson), and
        # the deletion-neighborhood transform is an interpreted lambda
        # worth evaluating once.  Skinny relation: (id, signature).
    ).persist()
    if sig_count_cap is not None:
        ok = (
            sigs.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") <= sig_count_cap)
            .select("sig")
        )
        sigs = sigs.join(ok, "sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    s = df.select(F.col(id_col), F.col(string_col).alias("s"))
    sa, sb = s.alias("sa"), s.alias("sb")
    return (
        cands.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("sa.s"), F.col("sb.s")).alias("dist"),
        )
        .where(F.col("dist") <= threshold)
    )


@register(
    "x53_edit_distance_join",
    "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, "
    " CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist "
    "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey "
    "WHERE levenshtein(a.c_name, b.c_name) <= 1",
    "string similarity join: customer-name pairs within edit distance 1 "
    "via deletion-neighborhood equi-join blocking + exact levenshtein "
    "verify, vs the oracle's quadratic all-pairs join",
)
def x53_edit_join(spark, sf_dir) -> DataFrame:
    return edit_distance_join(
        t(spark, sf_dir, "customer"), "c_name", "c_custkey"
    )

"""Property-based invariants for the partition planner (hypothesis).

The ported unit tests pin the reference's documented vectors; these pin the
*laws* that make partitioned reads lossless at any scale:

* bounds() covers [mn, mx] exactly: contiguous, no gaps, no overlap
  (the reference's own float-stride arithmetic has a gap bug we fixed --
  SURVEY 7.5 risk 2 / plans/partition.py module docstring).
* every integer in [mn, mx] falls in exactly one partition under the
  half-open-interior / closed-last predicate scheme.
* the requested partition count is honored.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from conecta_spark.plans.partition import bound_predicate, bounds

ranges = st.tuples(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=-(10**12), max_value=10**12),
).filter(lambda t: t[0] < t[1])


@given(rng=ranges, n=st.integers(min_value=1, max_value=64))
@settings(max_examples=300, deadline=None)
def test_bounds_are_contiguous_and_cover(rng, n):
    mn, mx = rng
    bs = bounds(mn, mx, n)
    assert len(bs) == n
    assert bs[0][0] == mn
    assert bs[-1][1] == mx
    for (s1, e1), (s2, e2) in zip(bs, bs[1:]):
        assert e1 == s2, "gap or overlap between partitions"
        assert s1 <= e1 and s2 <= e2


@given(rng=ranges, n=st.integers(min_value=1, max_value=16))
@settings(max_examples=150, deadline=None)
def test_every_value_in_exactly_one_partition(rng, n):
    mn, mx = rng
    bs = bounds(mn, mx, n)

    def member(v, b, is_last):
        lo, hi = b
        return (v >= lo and v <= hi) if is_last else (v >= lo and v < hi)

    # probe the edges of every bound plus the global edges
    probes = {mn, mx}
    for lo, hi in bs:
        probes.update({lo, hi, lo + 1, hi - 1})
    for v in probes:
        if not (mn <= v <= mx):
            continue
        hits = sum(
            member(v, b, i == len(bs) - 1) for i, b in enumerate(bs)
        )
        assert hits == 1, f"value {v} in {hits} partitions: {bs}"


@given(rng=ranges, n=st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_predicate_text_matches_membership(rng, n):
    mn, mx = rng
    bs = bounds(mn, mx, n)
    for i, b in enumerate(bs):
        pred = bound_predicate("c", b, i == len(bs) - 1)
        op = "<=" if i == len(bs) - 1 else "<"
        assert pred == f"c >= {b[0]} and c {op} {b[1]}"

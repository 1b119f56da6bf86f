"""Planner invariants -- ports every case of the reference's Rust unit tests
(conecta-core/src/partition.rs:136-301, metadata.rs:155-260) to pytest."""

from __future__ import annotations

import pytest

from conecta_spark.plans import (
    NeededMetadata,
    PartitionConfig,
    PartitionPlan,
    QueryPartitioningMode,
    bounds,
    create_bounded_queries,
    create_partition_plan,
    wrap_query_with_bounds,
)

Q = "select * from lineitem"


class TestBounds:
    def test_even_split(self):
        assert bounds(0, 9, 3) == [(0, 3), (3, 6), (6, 9)]

    def test_uneven_split_matches_reference_vectors(self):
        # partition.rs:143-158 expected values
        assert bounds(0, 10, 3) == [(0, 3), (3, 6), (6, 10)]

    def test_single_partition(self):
        assert bounds(0, 10, 1) == [(0, 10)]

    def test_contiguous_no_gaps(self):
        # The reference's float-trunc version drops value 4 here (SURVEY 7.5
        # risk 2 / partition.py module docstring); ours must stay contiguous.
        bs = bounds(0, 10, 4)
        for (_, stop), (nxt, _) in zip(bs, bs[1:]):
            assert stop == nxt
        assert bs[0][0] == 0 and bs[-1][1] == 10

    def test_contiguous_property(self):
        for mn, mx, n in [(1, 7, 3), (5, 1000, 7), (-50, 50, 9), (0, 2, 2)]:
            bs = bounds(mn, mx, n)
            assert len(bs) == n
            assert bs[0][0] == mn
            assert bs[-1][1] == mx
            for (_, stop), (nxt, _) in zip(bs, bs[1:]):
                assert stop == nxt

    def test_min_not_less_than_max_raises(self):
        with pytest.raises(ValueError):
            bounds(5, 5, 2)
        with pytest.raises(ValueError):
            bounds(9, 5, 2)

    def test_zero_partitions_raises(self):
        with pytest.raises(ValueError):
            bounds(0, 10, 0)


class TestConfigValidation:
    def test_empty_queries_raises(self):
        with pytest.raises(ValueError, match="queries"):
            PartitionConfig(query=[])

    def test_double_partition_scheme_raises(self):
        with pytest.raises(ValueError, match="Double partition"):
            PartitionConfig(query=[Q, Q], partition_on="l_orderkey",
                            partition_num=2)

    def test_partition_num_without_on_raises(self):
        with pytest.raises(ValueError, match="partition_on"):
            PartitionConfig(query=[Q], partition_num=2)

    def test_range_without_on_raises(self):
        with pytest.raises(ValueError, match="partition_on"):
            PartitionConfig(query=[Q], partition_range=(0, 10))

    def test_range_min_ge_max_raises(self):
        with pytest.raises(ValueError, match="min"):
            PartitionConfig(query=[Q], partition_on="k",
                            partition_range=(10, 10))

    def test_mode_one_partitioned(self):
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=4)
        assert cfg.mode is QueryPartitioningMode.ONE_PARTITIONED_QUERY
        assert cfg.needed_metadata is NeededMetadata.COUNT_AND_MIN_MAX

    def test_mode_partitioned_queries(self):
        cfg = PartitionConfig(query=[Q, Q])
        assert cfg.mode is QueryPartitioningMode.PARTITIONED_QUERIES
        assert cfg.needed_metadata is NeededMetadata.COUNT

    def test_mode_unpartitioned(self):
        cfg = PartitionConfig(query=[Q])
        assert cfg.mode is QueryPartitioningMode.ONE_UNPARTITIONED_QUERY

    def test_range_skips_min_max_probe(self):
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=2,
                              partition_range=(0, 10))
        assert cfg.needed_metadata is NeededMetadata.COUNT

    def test_partition_on_without_num_is_unpartitioned(self):
        # partition.rs:75-79 catch-all arm
        cfg = PartitionConfig(query=[Q], partition_on="k")
        assert cfg.mode is QueryPartitioningMode.ONE_UNPARTITIONED_QUERY


class TestBoundedQueries:
    def test_wrap_interior_half_open(self):
        sql = wrap_query_with_bounds(Q, "k", (0, 5), is_last=False)
        assert sql == (
            "select * from (select * from lineitem) as query_inner "
            "where k >= 0 and k < 5"
        )

    def test_wrap_last_inclusive(self):
        sql = wrap_query_with_bounds(Q, "k", (5, 10), is_last=True)
        assert sql.endswith("where k >= 5 and k <= 10")

    def test_create_bounded_queries(self):
        qs = create_bounded_queries(Q, "k", 3, 0, 10)
        assert len(qs) == 3
        assert "k >= 0 and k < 3" in qs[0]
        assert "k >= 3 and k < 6" in qs[1]
        assert "k >= 6 and k <= 10" in qs[2]


class _FakeSource:
    """Mirror of the reference's DummySource mock (metadata.rs:109-153)."""

    def __init__(self, mn=0, mx=100):
        self._mn, self._mx = mn, mx
        self.min_max_calls = 0

    def min_max(self, sql, column):
        self.min_max_calls += 1
        return self._mn, self._mx


class TestCreatePartitionPlan:
    def test_partitioned_probes_min_max(self):
        src = _FakeSource(0, 10)
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=3)
        plan = create_partition_plan(src, cfg)
        assert src.min_max_calls == 1
        assert (plan.min, plan.max) == (0, 10)
        assert plan.partition_count == 3
        assert "k >= 6 and k <= 10" in plan.data_queries[-1]

    def test_user_range_skips_probe(self):
        src = _FakeSource()
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=2,
                              partition_range=(0, 8))
        plan = create_partition_plan(src, cfg)
        assert src.min_max_calls == 0
        assert (plan.min, plan.max) == (0, 8)
        assert plan.partition_count == 2

    def test_multi_query_passthrough(self):
        src = _FakeSource()
        q2 = "select * from orders"
        plan = create_partition_plan(src, PartitionConfig(query=[Q, q2]))
        assert plan.data_queries == [Q, q2]
        assert plan.min is None and plan.max is None

    def test_unpartitioned_single_query(self):
        src = _FakeSource()
        plan = create_partition_plan(src, PartitionConfig(query=[Q]))
        assert plan.data_queries == [Q]
        assert src.min_max_calls == 0

    def test_all_null_partition_column_raises(self):
        class NullSource:
            def min_max(self, sql, column):
                return None, None

        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=2)
        with pytest.raises(ValueError, match="no"):
            create_partition_plan(NullSource(), cfg)

    def test_degenerate_single_value_range(self):
        src = _FakeSource(7, 7)
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=4)
        plan = create_partition_plan(src, cfg)
        assert plan.partition_count == 1
        assert "k >= 7" in plan.data_queries[0]

    def test_plan_serializes_to_json(self):
        src = _FakeSource(0, 10)
        cfg = PartitionConfig(query=[Q], partition_on="k", partition_num=2)
        plan = create_partition_plan(src, cfg)
        assert isinstance(plan, PartitionPlan)
        d = plan.to_dict()
        assert d["min"] == 0 and d["max"] == 10
        assert d["config"]["query_partition_mode"] == "OnePartitionedQuery"
        assert plan.to_json()

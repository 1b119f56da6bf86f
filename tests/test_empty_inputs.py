"""Every registered query must survive ZERO-ROW inputs -- at 100 TB,
empty filtered slices, empty partitions, and empty ingest batches are
routine, and an operator that throws on them takes the pipeline down.

One sweep over the full registry against schema-identical empty twins of
every driver table.  Row counts are not asserted (an empty corpus has
empty stats/neighbors/clusters by definition); not crashing and keeping
a well-formed schema is the contract.  The ml paths (x13/x14) earned
explicit guards here: Spark ML ``.fit()`` throws on zero rows.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conecta_spark.queries import REGISTRY, _load_extensions

_load_extensions()


@pytest.fixture(scope="module")
def empty_dir(oracle_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for p in glob.glob(f"{oracle_dir}/*.parquet"):
        schema = pq.read_schema(p)
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in schema}),
            str(d / os.path.basename(p)),
        )
    return str(d)


def test_every_registered_query_survives_empty_tables(spark, empty_dir):
    failures = []
    for name, qd in REGISTRY.items():
        try:
            df = qd.fn(spark, empty_dir)
            df.count()
            assert df.schema.fields, f"{name}: degenerate empty schema"
        except Exception as e:  # collect all, report together
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)

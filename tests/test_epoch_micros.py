"""Pin both dtype branches of :func:`conecta_spark.queries.epoch_micros`.

The round-3 regression: regenerated testdata stores events.ts as naive
parquet timestamp[us], which Spark 4 reads as TIMESTAMP_NTZ, and
``unix_micros`` rejects NTZ.  Both branches must agree with each other and
with the raw naive epoch value, independent of the session timezone.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from conecta_spark.queries import epoch_micros

# 2024-03-01 12:30:45.123456 naive; epoch micros treating it as UTC.
_NAIVE = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
_DELTA = _NAIVE - dt.datetime(1970, 1, 1)
_EPOCH_US = (
    _DELTA.days * 86_400_000_000
    + _DELTA.seconds * 1_000_000
    + _DELTA.microseconds
)


def _one_row_df(spark, dtype):
    schema = T.StructType([T.StructField("ts", dtype)])
    return spark.createDataFrame([(_NAIVE,)], schema)


def test_ntz_branch(spark):
    df = _one_row_df(spark, T.TimestampNTZType())
    got = df.select(epoch_micros(df).alias("us")).collect()[0].us
    assert got == _EPOCH_US


def test_ltz_branch(spark):
    # Session tz is UTC (session.py), so the naive literal lands on the
    # same instant and unix_micros returns the identical value.
    df = _one_row_df(spark, T.TimestampType())
    got = df.select(epoch_micros(df).alias("us")).collect()[0].us
    assert got == _EPOCH_US


def test_ntz_independent_of_session_timezone(spark):
    """The NTZ branch is pure field arithmetic -- changing the session
    timezone must not move the result (this is what makes it safe under
    the driver's session, whatever tz it runs in)."""
    df = _one_row_df(spark, T.TimestampNTZType())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = df.select(epoch_micros(df).alias("us")).collect()[0].us
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == _EPOCH_US


def test_events_table_branch_selected(spark, sf_dir):
    """Whichever type the session reads events.ts as, epoch_micros resolves
    and produces plausible 21st-century microsecond values."""
    from conecta_spark.queries import t

    events = t(spark, sf_dir, "events")
    row = events.select(
        F.min(epoch_micros(events)).alias("lo"),
        F.max(epoch_micros(events)).alias("hi"),
    ).collect()[0]
    assert 1_000_000_000_000_000 < row.lo <= row.hi < 4_000_000_000_000_000

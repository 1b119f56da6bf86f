#!/usr/bin/env python
"""Generate the r10 fixture extensions (run once; outputs are committed):

* rows_arr.parquet / typeof_arr.parquet -- a recorded exchange for
  ``select * from typed_rows_arr``: array columns exactly as Spark's JDBC
  layer lands pg arrays (list-typed), with the pg_typeof probe reporting
  the ``integer[]`` spellings the alias layer must normalize to the
  bridge's ``_int4`` catalog names;
* rows_geo_binary.parquet -- the SAME seven geometries as rows.parquet,
  but as Postgres BINARY wire bytes (big-endian f64 components;
  postgres wire: path = closed-flag byte + int32 count + pairs, polygon
  = int32 count + pairs), staged as bytea columns -- the COPY BINARY /
  bytea-staged ingestion path decode_geo_binary covers.  Keeping the
  geometries identical lets the e2e assert text-path == binary-path.
"""

from __future__ import annotations

import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def _pairs(*xs: float) -> bytes:
    return struct.pack(f">{len(xs)}d", *xs)


def _path(is_open: int, *coords: float) -> bytes:
    n = len(coords) // 2
    return bytes([is_open]) + n.to_bytes(4, "big") + _pairs(*coords)


def _poly(*coords: float) -> bytes:
    n = len(coords) // 2
    return n.to_bytes(4, "big") + _pairs(*coords)


def main() -> None:
    # -- array exchange -------------------------------------------------
    rows_arr = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int32()),
            "tags": pa.array(
                [["a", "b"], [], None], pa.list_(pa.string())
            ),
            "scores": pa.array(
                [[1.5, -2.25], [0.0], None], pa.list_(pa.float64())
            ),
            "counts": pa.array(
                [[1, 2, 3], [0], None], pa.list_(pa.int32())
            ),
            "bigs": pa.array(
                [[9007199254740993], [], None], pa.list_(pa.int64())
            ),
            "flags": pa.array(
                [[True, False], [True], None], pa.list_(pa.bool_())
            ),
        }
    )
    pq.write_table(rows_arr, os.path.join(HERE, "rows_arr.parquet"))
    typeof_arr = pa.table(
        {
            "id": pa.array(["integer"]),
            "tags": pa.array(["text[]"]),
            "scores": pa.array(["double precision[]"]),
            "counts": pa.array(["integer[]"]),
            "bigs": pa.array(["bigint[]"]),
            "flags": pa.array(["boolean[]"]),
        }
    )
    pq.write_table(typeof_arr, os.path.join(HERE, "typeof_arr.parquet"))

    # -- binary geo staging (same geometries as rows.parquet) -----------
    rows_bin = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int32()),
            "pt": pa.array(
                [_pairs(1.5, 2.5), _pairs(-3.0, 400.0), None], pa.binary()
            ),
            "poly": pa.array(
                [_poly(0, 0, 1, 0, 1, 1), _poly(2, 2, 3, 3), None],
                pa.binary(),
            ),
            "circ": pa.array(
                [_pairs(0, 0, 5), _pairs(1.5, -1.5, 0.5), None],
                pa.binary(),
            ),
            "bx": pa.array(
                [_pairs(1, 1, 0, 0), _pairs(5, 6, 2, 3), None], pa.binary()
            ),
            "seg": pa.array(
                [_pairs(0, 0, 1, 1), _pairs(2, 0, 0, 2), None], pa.binary()
            ),
            "ln": pa.array(
                [_pairs(1, -1, 0), _pairs(0.5, 2, -3.25), None],
                pa.binary(),
            ),
            "pth": pa.array(
                [_path(1, 0, 0, 1, 1, 2, 0), _path(0, 0, 0, 0, 3), None],
                pa.binary(),
            ),
        }
    )
    pq.write_table(
        rows_bin, os.path.join(HERE, "rows_geo_binary.parquet")
    )
    print("wrote rows_arr, typeof_arr, rows_geo_binary")


if __name__ == "__main__":
    main()

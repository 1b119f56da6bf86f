"""Polars integration (reference O24,
conecta-python/conecta/ext/__init__.py:11-98).

The reference monkey-patches polars' ConnectorX hook so
``pl.read_database_uri`` routes through conecta; ours does the same, routing
through :func:`conecta_spark.read_sql` -> Arrow -> ``pl.from_arrow``.
Import-guarded: polars is optional (and absent in this container -- the
patch/unpatch mechanics are tested with a stub module).
"""

from __future__ import annotations

import re
from typing import Any

_PATCHED: dict[str, Any] = {}


def _redact(conn: str) -> str:
    """Strip credentials from a connection string for error messages
    (reference ext/__init__.py:49-52)."""
    return re.sub(r"://[^@/]+@", "://***@", conn)


def _read_sql_conecta(
    query: str | list[str],
    connection_uri: str,
    partition_on: str | None = None,
    partition_range: tuple[int, int] | None = None,
    partition_num: int | None = None,
    protocol: str | None = None,  # accepted for ConnectorX signature parity
    **kwargs,
):
    from ..io import read_sql

    try:
        table = read_sql(
            connection_uri,
            query,
            partition_on=partition_on,
            partition_range=partition_range,
            partition_num=partition_num,
            return_backend="pyarrow",
        )
    except Exception as e:
        raise type(e)(
            str(e).replace(connection_uri, _redact(connection_uri))
        ) from None
    import polars as pl

    return pl.from_arrow(table)


def patch_polars() -> None:
    """Route ``polars.read_database_uri(engine='connectorx')`` through this
    engine.  Reversible via :func:`unpatch_polars`."""
    import polars.io.database._utils as plu  # type: ignore

    if "orig" not in _PATCHED:
        _PATCHED["orig"] = plu._read_sql_connectorx
    plu._read_sql_connectorx = _read_sql_conecta


def unpatch_polars() -> None:
    import polars.io.database._utils as plu  # type: ignore

    orig = _PATCHED.pop("orig", None)
    if orig is not None:
        plu._read_sql_connectorx = orig

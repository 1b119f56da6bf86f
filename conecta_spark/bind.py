"""SQL bind-parameter substitution (reference O23,
conecta-python/conecta/__init__.py:46-106).

Same contract as the reference: ``:name`` placeholders substituted from a
dict with escaping; ``IDENT(:name)`` quotes an identifier instead.  Two
deliberate improvements over the reference implementation: booleans render as
``TRUE``/``FALSE`` (the reference falls through ``isinstance(value, int)``
and emits Python's ``True``), and identifier quoting escapes embedded quote
characters.  Relates to Spark's native named parameters
(``spark.sql(sql, args=...)``) which we also support in
:func:`conecta_spark.sql.sql`.
"""

from __future__ import annotations

import re


def _format_value(value) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, (int, float)):
        return str(value)
    if value is None:
        return "NULL"
    raise ValueError(f"unsupported parameter type: {type(value)}")


def _format_ident(value, quote: str) -> str:
    if not isinstance(value, str):
        raise ValueError(f"IDENT() requires a string, got {type(value)}")
    return quote + value.replace(quote, quote * 2) + quote


def sql_bind(
    sql: str,
    parameters: dict,
    char_delimiter: str = ":",
    quote_ident_with: str = '"',
) -> str:
    """Replace ``:name`` placeholders in ``sql`` with escaped values.

    ``IDENT(:name)`` becomes a quoted identifier; bare ``:name`` becomes a
    SQL literal (strings single-quoted with ``''`` escaping, numbers inline,
    ``None`` -> ``NULL``, bools -> ``TRUE``/``FALSE``).
    """
    for key, value in parameters.items():
        placeholder = re.escape(char_delimiter + key)
        ident_pat = rf"IDENT\({placeholder}\)(?!\w)"
        if re.search(ident_pat, sql):
            ident = _format_ident(value, quote_ident_with)
            sql = re.sub(ident_pat, lambda _m, s=ident: s, sql)
        literal = _format_value(value)
        sql = re.sub(
            rf"(?<!\w){placeholder}(?!\w)", lambda _m, s=literal: s, sql
        )
    return sql

"""sql_bind cases -- mirrors the reference suite
(conecta-python/conecta/tests/test_bind.py:4-22) plus our extras."""

from __future__ import annotations

import pytest

from conecta_spark import sql_bind


def test_basic_substitution():
    out = sql_bind(
        "select IDENT(:col) FROM tbl1 t WHERE t.value = :var1 "
        "and t.name = :var2",
        {"col": "col1", "var1": 1, "var2": "somename"},
    )
    assert out == (
        'select "col1" FROM tbl1 t WHERE t.value = 1 '
        "and t.name = 'somename'"
    )


def test_string_escaping_sql_injectionish():
    out = sql_bind("select * from t where name = :v", {"v": "O'; drop --"})
    assert out == "select * from t where name = 'O''; drop --'"


def test_none_becomes_null():
    assert sql_bind("x = :v", {"v": None}) == "x = NULL"


def test_float_and_int():
    assert sql_bind(":a + :b", {"a": 1, "b": 2.5}) == "1 + 2.5"


def test_bool_renders_sql_not_python():
    assert sql_bind("flag = :v", {"v": True}) == "flag = TRUE"


def test_prefix_names_do_not_clobber():
    out = sql_bind("select :var, :var2", {"var": 1, "var2": 2})
    assert out == "select 1, 2"


def test_ident_custom_quote():
    out = sql_bind("select IDENT(:c)", {"c": "my col"}, quote_ident_with="`")
    assert out == "select `my col`"


def test_ident_escapes_embedded_quote():
    out = sql_bind("select IDENT(:c)", {"c": 'a"b'})
    assert out == 'select "a""b"'


def test_unsupported_type_raises():
    with pytest.raises(ValueError, match="unsupported"):
        sql_bind(":v", {"v": object()})


def test_backslash_in_value_is_literal():
    assert sql_bind(":v", {"v": "a\\1"}) == "'a\\1'"

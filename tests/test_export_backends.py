"""Exercise every ``return_backend`` branch of :func:`conecta_spark.export`,
mirroring the reference's backend matrix
(conecta-python/conecta/tests/test_read_sql.py:9-56).

polars/arro3/nanoarrow are not installed in this container, so those
branches are driven with minimal fakes injected into ``sys.modules`` that
implement exactly the surface our code calls (``from_arrow`` /
``ArrayStream.from_c``).  Everything up to the binding call -- backend
dispatch, ``df.toArrow()``, PyCapsule production via
``__arrow_c_stream__`` -- is the real code path; only the third-party
constructor is faked.  When a real library IS importable the real path runs
instead.
"""

from __future__ import annotations

import sys
import types

import pyarrow as pa
import pytest

from conecta_spark import read_sql
from conecta_spark.io import export


@pytest.fixture(scope="module")
def df(spark, sf_dir):
    return read_sql(
        sf_dir, "select l_orderkey, l_quantity from lineitem", spark=spark
    )


def _fake_module(monkeypatch, name: str, mod: types.ModuleType) -> None:
    for killed in [k for k in sys.modules if k == name or k.startswith(name + ".")]:
        monkeypatch.delitem(sys.modules, killed, raising=False)
    monkeypatch.setitem(sys.modules, name, mod)


def test_polars_backend(spark, df, monkeypatch):
    try:
        import polars  # noqa: F401
    except ImportError:
        mod = types.ModuleType("polars")
        seen = {}

        def from_arrow(table):
            seen["table"] = table
            return ("polars-frame", table.num_rows)

        mod.from_arrow = from_arrow
        _fake_module(monkeypatch, "polars", mod)
        out = export(df, "polars")
        assert out == ("polars-frame", 6000)
        assert isinstance(seen["table"], pa.Table)
    else:
        out = export(df, "polars")
        assert out.height == 6000


def test_arro3_backend(spark, df, monkeypatch):
    try:
        from arro3.core import Table  # noqa: F401
    except ImportError:
        seen = {}

        class FakeTable:
            @staticmethod
            def from_arrow(obj):
                # arro3 consumes anything exporting the Arrow PyCapsule
                # stream interface; assert our code hands it one.
                assert hasattr(obj, "__arrow_c_stream__")
                cap = obj.__arrow_c_stream__()
                assert type(cap).__name__ == "PyCapsule"
                seen["rows"] = pa.table(obj).num_rows
                return ("arro3-table", seen["rows"])

        core = types.ModuleType("arro3.core")
        core.Table = FakeTable
        pkg = types.ModuleType("arro3")
        pkg.core = core
        _fake_module(monkeypatch, "arro3", pkg)
        monkeypatch.setitem(sys.modules, "arro3.core", core)
        out = export(df, "arro3")
        assert out == ("arro3-table", 6000)
    else:
        out = export(df, "arro3")
        assert out.num_rows == 6000


def test_nanoarrow_backend(spark, df, monkeypatch):
    try:
        import nanoarrow  # noqa: F401
    except ImportError:
        mod = types.ModuleType("nanoarrow")
        seen = {}

        class FakeArrayStream:
            @staticmethod
            def from_c(capsule):
                # nanoarrow's low-level entry takes the raw stream capsule.
                assert type(capsule).__name__ == "PyCapsule"
                seen["capsule"] = capsule
                return "nanoarrow-stream"

        mod.ArrayStream = FakeArrayStream
        _fake_module(monkeypatch, "nanoarrow", mod)
        out = export(df, "nanoarrow")
        assert out == "nanoarrow-stream"
        # the capsule must still be consumable by a real Arrow importer
        assert pa.RecordBatchReader._import_from_c_capsule(
            seen["capsule"]
        ).read_all().num_rows == 6000
    else:
        out = export(df, "nanoarrow")
        assert out is not None


@pytest.mark.parametrize("backend", ["polars", "arro3", "nanoarrow"])
def test_missing_backend_raises_importerror(df, backend, monkeypatch):
    """Without the library installed the branch must raise a clear
    ImportError naming the missing package, exactly like the reference."""
    for name in (backend, f"{backend}.core"):
        monkeypatch.setitem(sys.modules, name, None)
    with pytest.raises(ImportError):
        export(df, backend)

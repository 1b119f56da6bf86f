"""Driver-window composition guard.

The driver's CORRECTNESS gate records only the FIRST 50 entries of
``queries()`` iteration order, so window composition is a correctness
artifact: an accidental reorder silently drops an entry's driver row
(never-driver-run gaps are what the judge flags).  Pin the invariants the
round plans rely on.
"""

from __future__ import annotations

import __spark_entry__ as entry
from conecta_spark.queries import _PRIORITY_TIERS, _WINDOW


def test_window_is_exactly_50_unique_slots():
    names = list(entry.queries())
    window = names[:50]
    assert len(set(window)) == 50
    prefixes = {n.split("_", 1)[0] for n in window}
    # every prefix the tiers promised actually landed inside the cap
    assert set(_WINDOW) <= prefixes, sorted(set(_WINDOW) - prefixes)


def test_sentinels_and_core_smoke_stay_in_window():
    """The standing regression sentinels (NTZ drift, oracle dtype class,
    streaming) and the every-round smoke trio must never rotate out."""
    window_prefixes = {
        n.split("_", 1)[0] for n in list(entry.queries())[:50]
    }
    for required in ("q01", "q02", "q12", "x16", "x56", "x65"):
        assert required in window_prefixes, required


def test_r12_rotation_firsts_get_driver_rows():
    """Round-12 promise (r11 verdict task 2): q17-q20/q27/q31-q33 -- the
    only entries whose last driver row is three rounds old (r8) --
    rotate in first, followed by the three NEW entries: x79 (persisted
    IVF ANN store lifecycle), x80 (refrozen signature store), and x81
    (reclustered ANN store)."""
    window = list(entry.queries())[:50]
    leaders = [n.split("_", 1)[0] for n in window[:11]]
    assert leaders == [
        "q17", "q18", "q19", "q20", "q27", "q31", "q32", "q33",
        "x79", "x80", "x81",
    ], leaders


def test_r12_window_covers_engine_moved_entries():
    """The r12 store-lifecycle rework touched minhash_store.py
    (x77/x78's code paths) and the assign_cells factor-out touched
    simsearch's IVF build (x14; x42 shares the file); each must re-earn
    a driver row this round rather than coast on an old proof."""
    window_prefixes = {
        n.split("_", 1)[0] for n in list(entry.queries())[:50]
    }
    for touched in ("x77", "x78", "x14", "x42"):
        assert touched in window_prefixes, touched


def test_every_entry_is_oracled():
    """r6 invariant: the rows-only set is empty -- every registered query
    carries a DuckDB oracle.  A new entry registered with oracle=None
    should be a deliberate, visible decision, not a default."""
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), sorted(set(qs) - set(oracles))


def test_tiers_reference_real_entries():
    """A typo'd prefix in _PRIORITY_TIERS silently burns a window slot."""
    prefixes = {n.split("_", 1)[0] for n in entry.queries()}
    for tier in _PRIORITY_TIERS:
        for p in tier:
            assert p in prefixes, f"tier prefix {p} matches no registry entry"

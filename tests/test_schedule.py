"""Properties of the driver-schedule rotation in __spark_entry__.

The driver records CORRECTNESS rows for only the first ~50 entries of
``queries()`` per round, so dict order IS the test schedule. These tests pin
the budget rules: never-tested oracled ids claim front slots, re-verify
picks the STALEST greens first, and permanent rows-only ids (whose ledger
row can only ever be err=no_oracle) never consume a front-50 slot while
anything else is eligible.

No Spark session needed - ordering is pure ledger arithmetic.
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def _reload():
    return importlib.reload(entry)


def test_front50_spends_budget_on_never_tested_oracled_ids():
    e = _reload()
    green = e._green_rounds()
    front = e._ordered_ids()[:50]
    reg = e._REGISTRY
    rows_only = [q for q in front if reg[q].oracle is None]
    assert rows_only == [], f"front-50 wastes slots on rows-only ids: {rows_only}"
    never = [q for q in front if q not in green and reg[q].oracle is not None]
    # every front slot not spent on a never-tested id must be a re-verify
    assert len(never) + sum(1 for q in front if q in green) == 50


def test_reverify_orders_stalest_green_first(monkeypatch):
    e = _reload()
    # Simulate the all-green world (every oracled id green, staggered rounds):
    # ids green in round 1 must sort before ids green in round 3.
    reg = e._REGISTRY
    oracled = [q for q in reg if reg[q].oracle is not None]
    fake = {q: 1 + (i % 3) for i, q in enumerate(oracled)}  # rounds 1..3
    monkeypatch.setattr(e, "_green_rounds", lambda: fake)
    ordered = e._ordered_ids()
    greens = [q for q in ordered if q in fake]
    rounds = [fake[q] for q in greens]
    assert rounds == sorted(rounds), "re-verify bucket must be staleness-sorted"
    # rows-only ids still sort after every green
    first_rows_only = next(i for i, q in enumerate(ordered) if reg[q].oracle is None)
    last_green = max(i for i, q in enumerate(ordered) if q in fake)
    assert last_green < first_rows_only


def test_oracle_sql_covers_exactly_the_oracled_ids():
    e = _reload()
    reg = e._REGISTRY
    osql = e.oracle_sql()
    assert set(osql) == {q for q in reg if reg[q].oracle is not None}
    assert len(e.queries()) == len(reg)

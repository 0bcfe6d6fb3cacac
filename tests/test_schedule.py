"""Properties of the driver-schedule rotation in __spark_entry__.

The driver records CORRECTNESS rows for only the first ~50 entries of
``queries()`` per round, so dict order IS the test schedule. These tests pin
the budget rules: never-tested oracled ids claim front slots, re-verify
picks the STALEST greens first, rows-only ids that have NEVER produced a
driver-ledger row get exactly one evidence slot (sorted just after the
stalest green cohort), and rows-only ids that already have their permanent
err=no_oracle row never consume a front-50 slot again.

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
    ran = e._ever_ran()
    front = e._ordered_ids()[:50]
    reg = e._REGISTRY
    # rows-only ids in the front-50 are allowed ONLY for their one-time
    # evidence row: any that already has a ledger row is a wasted slot
    wasted = [q for q in front if reg[q].oracle is None and q in ran]
    assert wasted == [], f"front-50 re-burns slots on ran rows-only ids: {wasted}"
    never = [q for q in front if q not in green and reg[q].oracle is not None]
    fresh_rows_only = [q for q in front if reg[q].oracle is None]
    assert len(never) + len(fresh_rows_only) + sum(
        1 for q in front if q in green
    ) == 50


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
    ran = e._ever_ran()
    pos = {q: i for i, q in enumerate(ordered)}
    r1_greens = [q for q in greens if fake[q] == 1]
    r2_greens = [q for q in greens if fake[q] == 2]
    for q in reg:
        if reg[q].oracle is not None:
            continue
        if q in ran:
            # permanent err=no_oracle rows sort after every green
            assert pos[q] > max(pos[g] for g in greens), q
        else:
            # never-run rows-only: one-time slot between the stalest green
            # cohort and the next one
            assert pos[q] > max(pos[g] for g in r1_greens), q
            assert pos[q] < min(pos[g] for g in r2_greens), q


def test_never_run_rows_only_sink_after_their_row_lands(monkeypatch):
    e = _reload()
    reg = e._REGISTRY
    # once every rows-only id has a ledger row, NONE may outrank a green
    monkeypatch.setattr(e, "_ever_ran", lambda: set(reg))
    oracled = [q for q in reg if reg[q].oracle is not None]
    fake = dict.fromkeys(oracled, 1)
    monkeypatch.setattr(e, "_green_rounds", lambda: fake)
    ordered = e._ordered_ids()
    first_rows_only = next(i for i, q in enumerate(ordered) if reg[q].oracle is None)
    last_green = max(i for i, q in enumerate(ordered) if q in fake)
    assert last_green < first_rows_only


def test_oracle_sql_covers_exactly_the_oracled_ids():
    e = _reload()
    reg = e._REGISTRY
    osql = e.oracle_sql()
    assert set(osql) == {q for q in reg if reg[q].oracle is not None}
    assert len(e.queries()) == len(reg)

"""Properties of the driver-schedule rotation in __spark_entry__.

The driver records CORRECTNESS rows for only the first ~50 entries of
``queries()`` per round, so dict order IS the test schedule. These tests pin
the budget rules: never-tested oracled ids claim front slots, re-verify
picks the STALEST greens first, rows-only ids that have NEVER produced a
driver-ledger row get exactly one evidence slot (sorted just after the
stalest green cohort), rows-only ids whose err=no_oracle row matches their
CURRENT builder source never consume a front-50 slot again (a rewrite
re-arms the slot), and _REFRESH_FRONT force-refreshes greens whose code
was rewritten after their last driver row.

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
    # evidence row: any whose ledger row matches its CURRENT source (the
    # fingerprint file says so) is a wasted slot; a source rewrite re-arms
    wasted = [
        q for q in front
        if reg[q].oracle is None and q in ran and e._rows_only_evidence_current(q)
    ]
    assert wasted == [], f"front-50 re-burns slots on ran rows-only ids: {wasted}"
    never = [q for q in front if q not in green and reg[q].oracle is not None]
    fresh_rows_only = [q for q in front if reg[q].oracle is None]
    assert len(never) + len(fresh_rows_only) + sum(
        1 for q in front if q in green
    ) == 50


def test_reverify_orders_stalest_green_first(monkeypatch):
    e = _reload()
    # Simulate the all-green world (every oracled id green, staggered rounds):
    # ids green in round 1 must sort before ids green in round 3. Forced
    # refresh and evidence re-arming are separate mechanics (tested below);
    # neutralize them so pure staleness ordering is what's under test.
    monkeypatch.setattr(e, "_REFRESH_FRONT", [])
    monkeypatch.setattr(e, "_rows_only_evidence_current", lambda q: True)
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
    # once every rows-only id has a ledger row MATCHING its current source,
    # NONE may outrank a green
    monkeypatch.setattr(e, "_ever_ran", lambda: set(reg))
    monkeypatch.setattr(e, "_rows_only_evidence_current", lambda q: True)
    oracled = [q for q in reg if reg[q].oracle is not None]
    fake = dict.fromkeys(oracled, 1)
    monkeypatch.setattr(e, "_green_rounds", lambda: fake)
    ordered = e._ordered_ids()
    first_rows_only = next(i for i, q in enumerate(ordered) if reg[q].oracle is None)
    last_green = max(i for i, q in enumerate(ordered) if q in fake)
    assert last_green < first_rows_only


def test_refresh_front_forces_rewritten_greens_and_self_retires(monkeypatch):
    """A green id listed in _REFRESH_FRONT with through_round >= its latest
    green round is forced to the schedule front; once a green from a LATER
    round lands it sinks back into the normal rotation."""
    e = _reload()
    reg = e._REGISTRY
    oracled = [q for q in reg if reg[q].oracle is not None]
    target = oracled[0]
    fake = dict.fromkeys(oracled, 5)
    fake[target] = 3  # stale green, rewritten after r3
    monkeypatch.setattr(e, "_green_rounds", lambda: fake)
    monkeypatch.setattr(e, "_REFRESH_FRONT", [(target, 6)])
    assert e._ordered_ids()[0] == target
    # a fresh green past through_round retires the forced refresh: the id
    # must no longer hold the very first slot (it rejoins staleness order)
    fake[target] = 7
    ordered = e._ordered_ids()
    pos = ordered.index(target)
    greens_r5 = [q for q in oracled if fake[q] == 5]
    assert pos > max(ordered.index(g) for g in greens_r5)


def test_rows_only_rewrite_rearms_evidence_slot(monkeypatch):
    """A rows-only id WITH a ledger row re-arms its one-time evidence slot
    when its builder source no longer matches the recorded fingerprint
    (r6 verdict #3: the Arrow-rewritten ext_knn_lsh never re-evidenced)."""
    e = _reload()
    reg = e._REGISTRY
    rows_only = [q for q in reg if reg[q].oracle is None]
    armed = rows_only[0]
    monkeypatch.setattr(e, "_REFRESH_FRONT", [])
    monkeypatch.setattr(e, "_ever_ran", lambda: set(reg))
    oracled = [q for q in reg if reg[q].oracle is not None]
    fake = {q: 1 + (i % 3) for i, q in enumerate(oracled)}
    monkeypatch.setattr(e, "_green_rounds", lambda: fake)
    monkeypatch.setattr(
        e, "_rows_only_evidence_current", lambda q: q != armed
    )
    ordered = e._ordered_ids()
    pos = {q: i for i, q in enumerate(ordered)}
    r1_greens = [q for q in oracled if fake[q] == 1]
    r2_greens = [q for q in oracled if fake[q] == 2]
    # re-armed: slots in between the stalest and next green cohorts
    assert pos[armed] > max(pos[g] for g in r1_greens)
    assert pos[armed] < min(pos[g] for g in r2_greens)
    # its siblings (evidence current) stay parked at the back
    for q in rows_only:
        if q != armed:
            assert pos[q] > max(pos[g] for g in oracled)


def test_builder_fingerprint_stable_and_distinct():
    e = _reload()
    reg = e._REGISTRY
    rows_only = [q for q in reg if reg[q].oracle is None]
    fps = {q: e._builder_fingerprint(q) for q in rows_only}
    # deterministic within a process...
    assert fps == {q: e._builder_fingerprint(q) for q in rows_only}
    # ...and builders with different source hash differently
    assert len(set(fps.values())) == len(fps)


def test_oracle_sql_covers_exactly_the_oracled_ids():
    e = _reload()
    reg = e._REGISTRY
    osql = e.oracle_sql()
    assert set(osql) == {q for q in reg if reg[q].oracle is not None}
    assert len(e.queries()) == len(reg)


def test_rows_only_evidence_reconcile(tmp_path, monkeypatch):
    """--reconcile records the CURRENT fingerprint for exactly the rows-only
    ids present in the newest ledger (evidence for this source), leaving
    absent ids armed. A bug here silently mis-parks ids next round."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "rows_only_evidence",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "rows_only_evidence.py",
        ),
    )
    roe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(roe)
    e = _reload()
    rows_only = [q for q in e._REGISTRY if e._REGISTRY[q].oracle is None]
    target, absent = rows_only[0], rows_only[1]
    monkeypatch.setattr(roe, "HERE", str(tmp_path))
    monkeypatch.setattr(roe, "EVIDENCE_PATH", str(tmp_path / "ev.json"))
    # two ledgers: the OLD one also names `absent`, but only the NEWEST
    # ledger counts as evidence
    (tmp_path / "CORRECTNESS_r08.json").write_text(
        json.dumps({absent: {"spark_rows": 3, "err": "no_oracle"}})
    )
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({target: {"spark_rows": 5, "err": "no_oracle"}})
    )
    assert roe.main(["--reconcile"]) == 0
    rec = json.loads((tmp_path / "ev.json").read_text())
    assert rec == {target: e._builder_fingerprint(target)}

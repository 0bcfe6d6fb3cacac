"""Maintain tools/rows_only_evidence.json - the {qid: source_fingerprint}
ledger that pins WHICH code each rows-only driver-evidence row belongs to.

The schedule (__spark_entry__._ordered_ids) sinks a rows-only id to the
permanent back of the rotation only while its recorded fingerprint matches
the current builder source; a rewrite re-arms its one-time evidence slot so
the new code lands a fresh spark_rows>0 row on driver hardware (r6 verdict
item #3: the Arrow-matmul ext_knn_lsh rewrite never re-evidenced under the
old "has any ledger row" rule).

Attribution (r8, closes the ADVICE reconcile-after-edit hazard): every
``queries()`` call appends the fingerprints of the code it is about to hand
the driver to tools/rows_only_fp_log.jsonl (run-time stamping). --reconcile
attributes a ledger's evidence rows to the LAST STAMP AT OR BEFORE that
ledger file landed - the code the driver actually ran - not to whatever the
working tree holds when reconcile happens to run. Only when no stamp
predates the ledger (pre-r8 ledgers) does it fall back to the current
recompute, and then ONLY if the source tree is git-clean (``--force``
overrides, for when you have verified the edits postdate the ledger).

Usage:

    python tools/rows_only_evidence.py                 # status table
    python tools/rows_only_evidence.py --reconcile     # record fingerprints
                                                       # for ids with a row
                                                       # in the latest ledger
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVIDENCE_PATH = os.path.join(HERE, "tools", "rows_only_evidence.json")
FP_LOG_PATH = os.path.join(HERE, "tools", "rows_only_fp_log.jsonl")


def _ledger_landed_at(path: str) -> float:
    """When the ledger LANDED: for a git-tracked ledger, the committer
    time of the last commit touching it (preserved across clones - a
    checkout's file mtime is checkout time and would post-date every
    committed stamp, mis-attributing evidence to post-edit stamps); for
    the untracked just-written-by-the-driver case, the file mtime."""
    try:
        rel = os.path.relpath(path, HERE)
        subprocess.run(
            ["git", "-C", HERE, "ls-files", "--error-unmatch", rel],
            capture_output=True, timeout=30, check=True,
        )
        out = subprocess.run(
            ["git", "-C", HERE, "log", "-1", "--format=%ct", "--", rel],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        if out:
            return float(out)
    except Exception:
        pass
    return os.path.getmtime(path)


def _latest_ledger() -> tuple[int, dict, float]:
    best_round, best, landed = 0, {}, 0.0
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        if rnd > best_round:
            try:
                with open(path) as f:
                    best_round, best = rnd, json.load(f)
                landed = _ledger_landed_at(path)
            except Exception:
                pass
    return best_round, best, landed


#: A clean stamp may only outrank a NEWER dirty stamp when it plausibly
#: belongs to the same driver pass as the ledger: queries() stamps at run
#: start and the ledger lands at run end, minutes-to-an-hour later. A clean
#: stamp older than this window is from some PRIOR run and preferring it
#: would over-claim - attribute the nearest stamp (even dirty) instead,
#: which is honest: a dirty fps that doesn't match the committed builder
#: simply re-arms the evidence slot (r9 review). The window is anchored to
#: the NEWEST stamp at or before the ledger landed - a proxy for run time
#: that, unlike the ledger's commit timestamp (r9 advice), does not decay:
#: a ledger committed days after the run keeps its legitimate clean stamp,
#: while a long-past clean stamp still loses to the dirty run that actually
#: produced the ledger.
_CLEAN_STAMP_WINDOW_S = 6 * 3600.0


def _stamp_before(mtime: float) -> dict | None:
    """Last run-time fingerprint stamp at or before the ledger landed
    (+1 s grace for same-second filesystem timestamps).

    Stamps made on a git-CLEAN query-source tree win over dirty-tree stamps
    (r8 ADVICE): the driver runs the committed tree, so its stamp is clean,
    while a post-edit local queries() run that slots between the driver run
    and the ledger's commit stamps dirty and must not steal attribution -
    but only within _CLEAN_STAMP_WINDOW_S of the ledger, else a stale clean
    stamp from a long-past run would itself steal attribution from the
    dirty run that actually produced the ledger. Pre-r9 stamps lack the
    flag and are used only when no clean stamp qualifies."""
    best_clean, best_any = None, None
    best_clean_ts, best_any_ts = 0.0, 0.0
    try:
        with open(FP_LOG_PATH) as f:
            for line in f:
                if not line.strip():
                    continue
                entry = json.loads(line)
                ts = entry.get("ts", 0)
                if ts <= mtime + 1.0:
                    # Select by ts, not file order: the append-only log can
                    # carry out-of-order stamps (clock step, merged logs),
                    # and the clean-stamp window must anchor to the NEWEST
                    # qualifying ts or a stale clean stamp outranks the
                    # dirty run that produced the ledger (r10 ADVICE).
                    if ts >= best_any_ts:
                        best_any = entry.get("fps")
                        best_any_ts = ts
                    if entry.get("clean") and ts >= best_clean_ts:
                        best_clean = entry.get("fps")
                        best_clean_ts = ts
    except (OSError, ValueError):
        return None
    if best_clean is not None and best_clean_ts >= best_any_ts - _CLEAN_STAMP_WINDOW_S:
        return best_clean
    return best_any


def _source_tree_clean() -> bool:
    """True when the query-source paths have no uncommitted changes (so the
    current recompute still describes the code the driver ran). Unknown
    (no git) counts as dirty - refuse rather than mis-attribute. Delegates
    to the ONE shared definition in __spark_entry__ so the stamp hook and
    this fallback can never disagree on scope (r9 review)."""
    import __spark_entry__ as e

    return e._query_source_tree_clean(HERE)


def main(argv: list[str]) -> int:
    import __spark_entry__ as e

    rows_only = [q for q in e._REGISTRY if e._REGISTRY[q].oracle is None]
    try:
        with open(EVIDENCE_PATH) as f:
            recorded = json.load(f)
    except Exception:
        recorded = {}

    if "--reconcile" in argv:
        rnd, ledger, mtime = _latest_ledger()
        stamps = _stamp_before(mtime)
        force = "--force" in argv
        # ids that graduated to oracles no longer occupy evidence slots
        recorded = {k: v for k, v in recorded.items() if k in rows_only}
        changed, refused = [], []
        for qid in rows_only:
            if qid not in ledger:
                continue
            if stamps is not None and qid in stamps:
                fp = stamps[qid]  # the code the driver actually ran
            elif force or _source_tree_clean():
                fp = e._builder_fingerprint(qid)
            else:
                refused.append(qid)
                continue
            if recorded.get(qid) != fp:
                recorded[qid] = fp
                changed.append(qid)
        with open(EVIDENCE_PATH, "w") as f:
            json.dump(dict(sorted(recorded.items())), f, indent=1)
            f.write("\n")
        print(
            f"reconciled against CORRECTNESS_r{rnd:02d}: updated {changed or 'nothing'}"
        )
        if refused:
            print(
                f"REFUSED (no run-time stamp predates the ledger and the source"
                f" tree is dirty - evidence would be mis-attributed): {refused}."
                f" Commit/stash the edits or pass --force if they postdate the"
                f" ledger."
            )
            return 1
        return 0

    ran = e._ever_ran()
    print(f"{'qid':32} {'ledger_row':>10} {'recorded':>16} {'current':>16} armed")
    for qid in rows_only:
        cur = e._builder_fingerprint(qid)
        rec = recorded.get(qid, "-")
        armed = not (qid in ran and rec == cur)
        print(f"{qid:32} {str(qid in ran):>10} {rec:>16} {cur:>16} {armed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

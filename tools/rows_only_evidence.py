"""Maintain tools/rows_only_evidence.json - the {qid: source_fingerprint}
ledger that pins WHICH code each rows-only driver-evidence row belongs to.

The schedule (__spark_entry__._ordered_ids) sinks a rows-only id to the
permanent back of the rotation only while its recorded fingerprint matches
the current builder source; a rewrite re-arms its one-time evidence slot so
the new code lands a fresh spark_rows>0 row on driver hardware (r6 verdict
item #3: the Arrow-matmul ext_knn_lsh rewrite never re-evidenced under the
old "has any ledger row" rule).

Usage (at ROUND START, before touching query code, so "current source"
still equals "the source the driver ran last round"):

    python tools/rows_only_evidence.py                 # status table
    python tools/rows_only_evidence.py --reconcile     # record fingerprints
                                                       # for ids with a row
                                                       # in the latest ledger

--reconcile records the current fingerprint for every rows-only id that has
a row in the NEWEST CORRECTNESS_r*.json (evidence for this exact source);
ids whose row predates their rewrite keep their stale/absent entry and stay
armed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVIDENCE_PATH = os.path.join(HERE, "tools", "rows_only_evidence.json")


def _latest_ledger() -> tuple[int, dict]:
    best_round, best = 0, {}
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        if rnd > best_round:
            try:
                with open(path) as f:
                    best_round, best = rnd, json.load(f)
            except Exception:
                pass
    return best_round, best


def main(argv: list[str]) -> int:
    import __spark_entry__ as e

    rows_only = [q for q in e._REGISTRY if e._REGISTRY[q].oracle is None]
    try:
        with open(EVIDENCE_PATH) as f:
            recorded = json.load(f)
    except Exception:
        recorded = {}

    if "--reconcile" in argv:
        rnd, ledger = _latest_ledger()
        changed = []
        for qid in rows_only:
            if qid in ledger:
                fp = e._builder_fingerprint(qid)
                if recorded.get(qid) != fp:
                    recorded[qid] = fp
                    changed.append(qid)
        with open(EVIDENCE_PATH, "w") as f:
            json.dump(dict(sorted(recorded.items())), f, indent=1)
            f.write("\n")
        print(f"reconciled against CORRECTNESS_r{rnd:02d}: updated {changed or 'nothing'}")
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

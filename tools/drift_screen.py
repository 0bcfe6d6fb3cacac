"""r13 drift screen (SCALE.md Standing drift-adjudication rule, regime-
corrected form): raw per-query floors only, no calibration workload.

For the candidate line N and each historical round M, the host-regime
factor f(N,M) = median over shared queries of floor_N(q)/floor_M(q) -
every benched query acts as a control. A query is a SUSPECT only if its
floor exceeds 1.2x the regime-corrected historical floor in EVERY round
it appears in: min_M floor_N(q) / (f(N,M) * floor_M(q)) > 1.2. A factor
shared by the whole set is the host moving, not the queries.

Usage: python drift_screen.py <bench-line-or-BENCH_rN.json>
"""
import json, glob, statistics, sys

# behave like a unix filter when piped to head(1)
import signal

signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def load(path):
    d = json.load(open(path))
    p = d.get("parsed", d)
    return p if isinstance(p, dict) else {}


import os

new = load(sys.argv[1])
nq = new["queries"]
rounds = {}
skipped_rounds = []
for f in sorted(glob.glob("/root/repo/BENCH_r*.json")):
    # exclude the candidate itself by file identity ONLY (r13 ADVICE: a
    # basename match wrongly dropped the real /root/repo/BENCH_r5.json
    # from history when screening an OUT-OF-REPO candidate that happened
    # to share the name; samefile is the correct and sufficient check -
    # the candidate always exists here or load() would have raised).
    if os.path.samefile(f, sys.argv[1]):
        continue
    p = load(f)
    if p.get("queries") and p.get("sf") == new.get("sf"):
        rounds[f.rsplit("/", 1)[-1]] = p["queries"]
    else:
        skipped_rounds.append((f.rsplit("/", 1)[-1], "sf mismatch or no queries"))

score = {q: [] for q in nq}
for rname, hq in rounds.items():
    shared = [q for q in nq if q in hq and hq[q] > 0]
    if len(shared) < 5:
        skipped_rounds.append((rname, f"only {len(shared)} shared queries (<5)"))
        continue
    factor = statistics.median(nq[q] / hq[q] for q in shared)
    for q in shared:
        score[q].append((nq[q] / (factor * hq[q]), rname, factor))

print(f"candidate sf={new.get('sf')}; rounds compared: {len(rounds)}")
# No silent caps (r13 ADVICE): name every round and query the screen
# could not use, so an empty cohort is distinguishable from no coverage.
for rname, why in skipped_rounds:
    print(f"  excluded round {rname}: {why}")
no_history = sorted(q for q, ss in score.items() if not ss)
if no_history:
    print(f"  no usable history ({len(no_history)} queries): {', '.join(no_history)}")
suspects = []
for q, ss in score.items():
    if not ss:
        continue
    best = min(ss)
    if best[0] > 1.2:
        # 'exceeds 1.2x in EVERY round' needs more than one round to mean
        # anything (r13 ADVICE): with a single historical comparison one
        # noisy sample suffices, so mark those provisional rather than
        # letting them stand as full suspects.
        suspects.append((q, best, len(ss)))
if suspects:
    print("DRIFT COHORT (regime-corrected raw floor > 1.2x in every round):")
    for q, (r, rname, factor), n in sorted(suspects, key=lambda t: -t[1][0]):
        tag = "" if n >= 2 else " [PROVISIONAL: single-round history]"
        print(f"  {q}: {r:.2f}x vs {rname} (regime factor {factor:.2f}, {n} rounds){tag}")
else:
    print("NO drift cohort: no query exceeds 1.2x its regime-corrected floor in every round.")
# telemetry: the per-round regime factors themselves
for rname in rounds:
    shared = [q for q in nq if q in rounds[rname] and rounds[rname][q] > 0]
    if len(shared) >= 5:
        f = statistics.median(nq[q] / rounds[rname][q] for q in shared)
        print(f"  regime factor vs {rname}: {f:.2f} over {len(shared)} shared queries")

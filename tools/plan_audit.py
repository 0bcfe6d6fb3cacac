"""Registry-wide physical-plan audit: every registered query's plan is
scanned for 100 TB anti-patterns. tests/test_plans.py asserts the heavy
hitters individually; this sweep guards the OTHER 150+ ids - a new operator
that quietly plans a cartesian product or a row-at-a-time Python eval fails
here before it ever reaches a driver round.

Hard flags (exit 1 unless allowlisted, which requires a reason below):
  - CartesianProduct            unbounded pair blowup
  - BroadcastNestedLoopJoin     per-row probe of a broadcast table, no keys
  - BatchEvalPython             row-at-a-time Python UDF (Arrow-less)

Informational (printed, never fatal):
  - exchange count per query (top shuffle consumers)
  - parquet scans with a Filter parent but zero pushed filters

Usage:
    python tools/plan_audit.py [sf_dir]    # default /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: qid -> {pattern: reason}. An entry here must justify WHY the pattern is
#: the right plan for that operator at scale.
_SCALAR_BNLJ = (
    "broadcast side is a 1-row scalar aggregate (a keyless join against a "
    "single global value) - constant-size broadcast at any corpus scale"
)

ALLOW: dict[str, dict[str, str]] = {
    "join_cross": {
        "CartesianProduct": "the operator IS a deliberate cross join "
        "(5x25 rows; capability coverage for CROSS JOIN syntax)",
        "BroadcastNestedLoopJoin": "Spark plans the small cross join as "
        "BNLJ when one side fits the broadcast threshold - same deliberate "
        "cross-join capability id",
    },
    "join_theta_band": {
        "BroadcastNestedLoopJoin": "deliberate non-equi band-join "
        "capability form (inequality-only predicate has no hash keys); the "
        "scale path is join_range_bucketed, plan-asserted to be an "
        "equi-join in tests/test_plans.py",
    },
    "ext_knn_cosine": {
        "BroadcastNestedLoopJoin": "broadcast side is the bounded query "
        "set (10 vectors); scoring every corpus row against each broadcast "
        "query IS the brute-force operator - at 100 TB the corpus side "
        "streams, the broadcast stays k rows",
    },
    "ext_knn_ann_recall": {
        "BroadcastNestedLoopJoin": "same bounded query-set broadcast as "
        "ext_knn_cosine (the recall harness runs the exact scorer as truth)",
    },
    "ext_domain_mixture": {
        "BroadcastNestedLoopJoin": "5-row per-stratum counts x 1-row "
        "global min - both sides bounded by stratum count, not corpus size",
    },
    "agg_hll_sketch_merge": {"BroadcastNestedLoopJoin": _SCALAR_BNLJ},
    "ext_text_tfidf": {"BroadcastNestedLoopJoin": _SCALAR_BNLJ + " (corpus n_docs for idf)"},
    "tpch_q11_important_stock": {
        "BroadcastNestedLoopJoin": _SCALAR_BNLJ + " (the HAVING threshold subquery)"
    },
    "tpch_q22_global_sales": {
        "BroadcastNestedLoopJoin": _SCALAR_BNLJ + " (the avg-acctbal threshold subquery)"
    },
    "udf_python_scalar": {
        "BatchEvalPython": "deliberate row-at-a-time UDF capability demo; "
        "the engine's hot paths use Arrow/pandas or JVM built-ins",
    },
    "udf_sql_register": {
        "BatchEvalPython": "SQL-registration parity demo (CREATE TEMPORARY "
        "FUNCTION lineage) of a Python scalar fn - same deliberate slow-path "
        "coverage as udf_python_scalar",
    },
    "udtf_python_lateral": {
        "BatchEvalPython": "Python UDTF API surface coverage on a "
        "doc_id < 30 slice; every production fan-out in the repo is "
        "JVM-side explode/sequence (lateral.py, ext_chunk_documents)",
    },
}


def flags_for(plan: str) -> list[str]:
    out = []
    for pat in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"):
        if pat in plan:
            out.append(pat)
    return out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from bee_proof_spark.queries import load_all
    from bee_proof_spark.session import build_session

    spark = build_session(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    hard: list[str] = []
    exchanges: dict[str, int] = {}
    unpushed: list[str] = []
    t0 = time.time()
    for qid in sorted(reg):
        try:
            df = reg[qid].builder(spark, sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # a query that cannot even plan is a failure
            hard.append(f"{qid}: PLAN-ERROR {ex}")
            continue
        for pat in flags_for(plan):
            if pat in ALLOW.get(qid, {}):
                continue
            hard.append(f"{qid}: {pat}")
        exchanges[qid] = plan.count("Exchange (") + plan.count("+- Exchange")
        # A Filter directly over a parquet scan that pushed nothing: either
        # the predicate is non-pushable (computed expr - fine) or a filter
        # ordering bug. Informational; eyeball the listed ids.
        for scan in re.finditer(r"PushedFilters: \[\]", plan):
            ctx = plan[max(0, scan.start() - 400): scan.start()]
            if re.search(r"\(\d+\) Filter", ctx):
                unpushed.append(qid)
                break

    top = sorted(exchanges.items(), key=lambda kv: -kv[1])[:10]
    print(f"\naudited {len(reg)} plans in {time.time() - t0:.0f}s")
    print("top shuffle consumers:", ", ".join(f"{q}={n}" for q, n in top))
    if unpushed:
        print("filter-over-scan with zero pushed filters (check predicate "
              f"pushability): {sorted(set(unpushed))}")
    if hard:
        print("\nHARD FLAGS:")
        for h in hard:
            print(" ", h)
    spark.stop()
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())

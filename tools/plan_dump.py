"""Dump .explain("formatted") for the benched queries to plans/r15/.

Optimization-round evidence artifact (guide section 1: capture the plan
shape - Exchange count, join strategy, PushedFilters/ReadSchema,
WholeStageCodegen spans, Python eval nodes - before and after each change).

Usage:
    python tools/plan_dump.py before [sf_dir] [query ...]
    python tools/plan_dump.py after  [sf_dir] [query ...]

With no explicit query list, dumps every BENCH_QUERIES member. The session
is the same build_session("perf") profile bench.py uses, so the captured
plan is the plan the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    rest = sys.argv[2:]
    sf = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    only = [a for a in rest if not os.path.isdir(a)]

    from bench import BENCH_QUERIES
    from bee_proof_spark.queries import load_all
    from bee_proof_spark.session import build_session

    spark = build_session(
        app_name="plan-dump",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    os.makedirs(OUT_DIR, exist_ok=True)

    names = only or [q for q in BENCH_QUERIES if q in reg]
    for qid in names:
        try:
            df = reg[qid].builder(spark, sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            plan = f"PLAN-ERROR: {ex}"
        path = os.path.join(OUT_DIR, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

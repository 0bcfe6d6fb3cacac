"""Pre-round verification sweep: every registered query vs its DuckDB oracle
in a DRIVER-LIKE session (Spark 4 defaults: ANSI ON, no engine profile).

This replicates the driver's t2 correctness gate for all 193 ids at sf0.01
(the driver itself caps at ~50/round), and is the discipline that keeps the
CORRECTNESS ledger green: run it fresh-process before ending a round.

Usage:
    python tools/sweep.py [sf_dir]      # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # Deliberately NOT build_session: the driver runs its own session with
    # Spark 4 defaults (ANSI on), and every query must pass under both.
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bee_proof_spark.queries import load_all
    from bee_proof_spark.testing import compare_to_oracle

    reg = load_all()
    fails: list[str] = []
    t0 = time.time()
    for qid in sorted(reg):
        try:
            ok, msg = compare_to_oracle(spark, reg[qid], sf)
        except Exception as ex:  # a crash is a failure, not an abort
            ok, msg = False, f"[{qid}] EXC: {ex}"
        if not ok:
            fails.append(msg)
            print("FAIL", msg[:300], flush=True)
    print(f"DONE {len(reg) - len(fails)}/{len(reg)} pass in {time.time() - t0:.0f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

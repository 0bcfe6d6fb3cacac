"""CLI entry: ``python -m bee_proof_spark.runner <manifest.json>``.

Parity with ``java ... ManifestRunner <manifest>`` (ManifestRunner.java:248-263):
parses the manifest, runs tasks sequentially, prints the output protocol, and
exits nonzero on the first failed statement.
"""

from __future__ import annotations

import sys

from bee_proof_spark.runner.executor import StatementError, run_manifest
from bee_proof_spark.runner.manifest import Manifest
from bee_proof_spark.session import build_session, reset_tmp_tree


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m bee_proof_spark.runner <manifest.json>", file=sys.stderr)
        return 2
    try:
        manifest = Manifest.from_file(argv[0])
    except (OSError, ValueError, TypeError, AttributeError) as ex:
        # Missing file, bad JSON, or valid JSON of the wrong shape (a list,
        # non-dict tasks, ...): clean CLI error, not a traceback - and no
        # Spark session is ever started.
        print(f"[ERROR] cannot load manifest {argv[0]}: {ex}", file=sys.stderr)
        return 1
    reset_tmp_tree()
    spark = build_session(app_name="bee-proof-spark-runner")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        run_manifest(manifest, spark)
    except (StatementError, OSError) as ex:
        print(f"[ERROR] {ex}", file=sys.stderr)
        return 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

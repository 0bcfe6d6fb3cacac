"""CLI entry: ``python -m bee_proof_spark.runner <manifest.json>``.

Parity with ``java ... ManifestRunner <manifest>`` (ManifestRunner.java:248-263):
parses the manifest, runs tasks sequentially, prints the output protocol, and
exits nonzero on the first failed statement.
"""

from __future__ import annotations

import sys

from bee_proof_spark.runner.executor import StatementError, run_manifest
from bee_proof_spark.runner.manifest import Manifest
from bee_proof_spark.runner.release_gates import RELEASE_HIVE_VERSION
from bee_proof_spark.session import build_session, reset_tmp_tree


def main(argv: list[str]) -> int:
    # In the reference the release is baked into WHICH jar the Ruby layer
    # launches (bee-proof.rb:5-27), not into the manifest; --release is this
    # CLI's equivalent of that jar choice and turns on the Hive-pin gates.
    usage = (
        "usage: python -m bee_proof_spark.runner "
        f"[--release={'|'.join(RELEASE_HIVE_VERSION)}] <manifest.json>"
    )
    release = None
    args = []
    opts_ended = False
    for a in argv:
        if opts_ended:
            args.append(a)
        elif a == "--":
            # Conventional end-of-options marker: everything after is a
            # path, so a manifest whose relative path starts with '-' is
            # still reachable (r10 ADVICE: the single-dash guard had made
            # such paths unpassable).
            opts_ended = True
        elif a.startswith("--release="):
            release = a.split("=", 1)[1]
        elif a.startswith("-") and a != "-":
            # '--release emr-5' (space form), unknown '--foo', or a
            # single-dash '-r' must be a clean usage error, not silently
            # treated as a manifest path (r9 review: '--release
            # manifest.json' printed 'cannot load manifest --release' and
            # ran with NO gating; r9 advice widened this to single-dash).
            # A bare '-' stays a path so stdin support remains possible.
            print(f"[ERROR] unknown option {a!r}", file=sys.stderr)
            print(usage, file=sys.stderr)
            return 2
        else:
            args.append(a)
    if len(args) != 1:
        print(usage, file=sys.stderr)
        return 2
    if release is not None and release not in RELEASE_HIVE_VERSION:
        print(
            f"[ERROR] unknown release {release!r}; expected one of "
            f"{tuple(RELEASE_HIVE_VERSION)}",
            file=sys.stderr,
        )
        return 2
    try:
        manifest = Manifest.from_file(args[0])
    except (OSError, ValueError, TypeError, AttributeError) as ex:
        # Missing file, bad JSON, or valid JSON of the wrong shape (a list,
        # non-dict tasks, ...): clean CLI error, not a traceback - and no
        # Spark session is ever started.
        print(f"[ERROR] cannot load manifest {args[0]}: {ex}", file=sys.stderr)
        return 1
    reset_tmp_tree()
    spark = build_session(app_name="bee-proof-spark-runner")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        run_manifest(manifest, spark, release=release)
    except (StatementError, OSError) as ex:
        print(f"[ERROR] {ex}", file=sys.stderr)
        return 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

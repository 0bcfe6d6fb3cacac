"""SparkSession profiles for the bee-proof-spark engine.

Mirrors the reference harness's pinned execution profile (ManifestRunner.java:169-229,
see SURVEY.md section 4.1): ephemeral local warehouse under ``./bee-proof-tmp``,
in-memory catalog (the Derby-in-memory metastore equivalent), fail-fast semantics,
and deterministic conf. Two profiles:

- ``parity``: disables adaptive join rewrites the reference disables
  (HIVECONVERTJOIN=false -> autoBroadcastJoinThreshold=-1,
  HIVESKEWJOIN=false -> adaptive.skewJoin off) for plan determinism.
- ``perf`` (default): lets Catalyst/AQE do its job - broadcast joins, skew
  handling, partition coalescing. This is the 100 TB posture.

Hive-compat semantics on either profile: ANSI off (Hive-style int division,
silent-null casts - Spark 4 defaults ANSI on), session timezone UTC.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

TMP_ROOT = "bee-proof-tmp"


def auto_shuffle_partitions(data_dir: str | None = None) -> int:
    """Shuffle-partition count sized to the input corpus, not a constant.

    A fixed count is wrong at both ends: 32 partitions over a 600M-row
    fixture spill (measured: ext_text_tfidf 107.8 s at 1000x with 32 vs
    71.0 s with 256, SCALE.md), while 256 over sf0.1 pays per-task overhead
    for nothing. Target ~24 MB of compressed parquet input per partition -
    parquet expands ~4-8x decoded, so this lands near the ~128 MB-per-task
    post-AQE sizing a cluster deployment would use - clamped to [32, 1024]
    and rounded to the nearest power of two for run-to-run stability (the
    probe fixtures land on exactly the measured-best 256 at 1000x, and on
    the long-standing 32 at sf0.1/100x). Returns 32 when the directory is
    unset/missing so sessions without a corpus keep the historical default.
    """
    if not data_dir or not os.path.isdir(data_dir):
        return 32
    total = 0
    for root, _, files in os.walk(data_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return _partitions_for_bytes(total)


def _partitions_for_bytes(total: int) -> int:
    # batch-only curve; stateful streaming sizes by ROW count instead
    # (replay._streaming_partitions_for_rows - replica fixtures compress
    # ~100x, so bytes under-count the state there)
    import math

    raw = max(32, min(1024, total // (24 * 1024 * 1024) or 1))
    return 2 ** round(math.log2(raw))

#: Conf shared by both profiles. Values are strings per SparkConf convention.
#: Static entries only - the env-derived entries (shuffle sizing, driver
#: memory) are resolved inside build_session() at CALL time: freezing them
#: at import meant a caller setting SPARK_GRAFT_SF_DIR after import ran a
#: 1000x corpus at the unset-env default of 32 partitions (the measured
#: 107.8-vs-71.0 s tfidf spill the auto-sizing exists to prevent), and
#: every import paid an O(corpus) directory walk even when no session was
#: ever built.
_COMMON_CONF: dict[str, str] = {
    # Hive-compat semantics (SURVEY.md section 4.2 "semantic gaps" row).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # In-memory catalog = the reference's throwaway Derby metastore
    # (ManifestRunner.java:195).
    "spark.sql.catalogImplementation": "in-memory",
    # The events fixture stores ts as parquet TIMESTAMP(NANOS), which Spark
    # rejects by default; the engine reads nanos as long and converts
    # (queries.tbl). Pinned at session build so behavior is uniform from
    # the first query - previously tbl() flipped it mid-session on the
    # first events read, so nanos handling depended on query order. tbl()
    # still sets it for foreign sessions (the driver builds its own).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas interchange (UDF paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep the UI off in tests/bench.
    "spark.ui.enabled": "false",
}


def _dynamic_conf() -> dict[str, str]:
    """Env-derived conf, resolved when a session is requested."""
    return {
        # Local-mode shuffle sizing: explicit SPARK_GRAFT_SHUFFLE wins; else
        # sized to the corpus named by SPARK_GRAFT_SF_DIR
        # (auto_shuffle_partitions - 32 at sf0.1, 256 at the 1000x fixture);
        # else the historical 32.
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE")
        or str(auto_shuffle_partitions(os.environ.get("SPARK_GRAFT_SF_DIR"))),
        # Local mode runs all 32 executor threads inside ONE driver JVM whose
        # default heap is 1g - far below what 32-way shuffles need (measured:
        # window aggs over a 6M-row fixture OOM at 1g, breeze at 8g). Only
        # read at JVM launch, so it applies to sessions this process creates;
        # a live session keeps its own (static-conf warn path).
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }

_PERF_CONF: dict[str, str] = {
    # AQE: runtime coalescing, skew-join splitting, dynamic join selection.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}

_PARITY_CONF: dict[str, str] = {
    # HIVECONVERTJOIN=false (ManifestRunner.java:205) - no auto broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # HIVESKEWJOIN=false (ManifestRunner.java:206).
    "spark.sql.adaptive.skewJoin.enabled": "false",
    # HIVEMETADATAONLYQUERIES=false (ManifestRunner.java:203).
    "spark.sql.optimizer.metadataOnly": "false",
}


def build_session(
    app_name: str = "bee-proof-spark",
    master: str | None = None,
    profile: str = "perf",
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine profile applied.

    ``profile`` is ``"perf"`` (default, AQE on) or ``"parity"``
    (reference-determinism pins, SURVEY.md section 4.1).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if warehouse_dir is None:
        warehouse_dir = os.path.join(tempfile.gettempdir(), TMP_ROOT, "warehouse")

    conf = dict(_COMMON_CONF)
    conf.update(_dynamic_conf())
    conf.update(_PERF_CONF if profile == "perf" else _PARITY_CONF)
    conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)

    active = SparkSession.getActiveSession()
    if active is not None:
        # getOrCreate() on a live session silently ignores every requested
        # conf (profile switches would be no-ops). Apply the runtime-settable
        # ones explicitly; warn when a static conf (warehouse, catalog) can't
        # be changed and differs from what was asked for, and ALSO warn when
        # a runtime conf is being flipped on a session this call did not
        # create (e.g. a profile='parity' call silently disabling AQE/
        # broadcast for an unrelated caller sharing the session). Keys the
        # caller explicitly passed via extra_conf are applied without the
        # mutation warning - the caller asked for exactly those.
        import warnings

        explicit = set(extra_conf or ())
        mutated: list[str] = []
        for k, v in conf.items():
            try:
                current = active.conf.get(k)
            except Exception:
                current = None
            try:
                active.conf.set(k, v)
                if current is not None and current != v and k not in explicit:
                    mutated.append(f"{k}: {current!r} -> {v!r}")
            except Exception:
                # Spark surfaces path-valued static confs as file: URIs;
                # normalize so an equal path never false-positives the warn.
                # current=None means the live session doesn't expose the key
                # at all (e.g. launch-only confs like driver memory) - that
                # is "unverifiable", not a mismatch; warning on it would fire
                # on every call even when the JVM actually matches.
                norm = lambda s: s.removeprefix("file:") if isinstance(s, str) else s  # noqa: E731
                if current is not None and norm(current) != norm(v):
                    warnings.warn(
                        f"build_session: static conf {k}={current!r} on the "
                        f"live session differs from requested {v!r}; "
                        "stop the session to apply it",
                        stacklevel=2,
                    )
        if mutated:
            warnings.warn(
                "build_session: reusing the live SparkSession and changing "
                "its runtime conf (shared by every other caller of this "
                f"session): {'; '.join(mutated)}",
                stacklevel=2,
            )
        return active

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def reset_tmp_tree(base_dir: str | None = None) -> str:
    """Delete and recreate the ephemeral warehouse/scratch tree.

    Mirrors the per-run directory reset at ManifestRunner.java:172-175.
    """
    base = base_dir or os.path.join(tempfile.gettempdir(), TMP_ROOT)
    shutil.rmtree(base, ignore_errors=True)
    for sub in ("warehouse", "scratch", "logs"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    return base

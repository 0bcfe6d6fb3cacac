"""Public verification API: the Ruby gem surface, Python-native.

Reference: lib/bee-proof/verification.rb:12-41 (for_release/add_task/run),
lib/bee-proof/task.rb, lib/bee-proof.rb:30-50 (process launch - replaced by
an in-process SparkSession; A3/A4 in SURVEY.md section 2-A). The Ruby layer
defaults verbose/debug to false (verification.rb:19-21) even though the Java
manifest default is true - we keep that parity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bee_proof_spark.runner.executor import run_manifest
from bee_proof_spark.runner.manifest import Manifest, Task
from bee_proof_spark.runner.release_gates import RELEASE_HIVE_VERSION
from bee_proof_spark.session import build_session, reset_tmp_tree

#: Known release profiles (pom.xml:28-66). All run the same Spark engine,
#: but the release's Hive pin is ENFORCED at validation time: statements
#: using constructs the pinned Hive lacks (INTERSECT/EXCEPT, bare UNION,
#: nullif, bround, 1.1+ date fns, ...) fail with a line-addressed error,
#: matching the reference's version-locked hive-exec behavior
#: (runner/release_gates.py; table derived from SURVEY.md section 2-B).
#: Derived from the gate table so the two can never diverge (r9 review:
#: a release accepted here but absent there would silently get ZERO gating).
KNOWN_RELEASES = tuple(RELEASE_HIVE_VERSION)


class Verification:
    def __init__(self, release: str):
        if release not in KNOWN_RELEASES:
            raise ValueError(f"unknown release {release!r}; expected one of {KNOWN_RELEASES}")
        self.release = release
        self.tasks: list[Task] = []
        self.verbose_output = False
        self.debug_output = False

    @classmethod
    def for_release(cls, release: str) -> Verification:
        return cls(release)

    def add_task(self, script_path: str, variables: dict[str, str] | None = None) -> Verification:
        self.tasks.append(Task(script=script_path, variables=dict(variables or {})))
        return self

    def manifest(self, enable_hadoop: bool = False) -> Manifest:
        return Manifest(
            tasks=list(self.tasks),
            enable_hadoop=enable_hadoop,
            verbose_output=self.verbose_output,
            debug_output=self.debug_output,
        )

    def run(
        self,
        enable_hadoop: bool = False,
        spark: SparkSession | None = None,
        out=None,
    ) -> None:
        """Run all tasks; raises on first failure (fail-fast, exit-1 parity).

        Session ownership is decided by what actually exists, not by the
        argument alone: build_session() returns any pre-existing active
        session, so "spark is None" does NOT mean this call created one.
        Only a session this call truly created is reset/stopped - wiping the
        tmp warehouse and stopping a live session some embedding app (or a
        session-scoped test fixture) owns would break every later use of it.
        """
        owns_session = False
        if spark is None:
            owns_session = SparkSession.getActiveSession() is None
            if owns_session:
                reset_tmp_tree()
            spark = build_session(app_name=f"bee-proof-{self.release}")
        try:
            run_manifest(self.manifest(enable_hadoop), spark, out=out, release=self.release)
        finally:
            if owns_session:
                spark.stop()

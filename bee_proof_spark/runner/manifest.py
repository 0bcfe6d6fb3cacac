"""Manifest + Task model: same JSON contract as the reference.

Reference: FakeEmrManifest.java:50-86 (parsing, defaults enableHadoop=false,
verboseOutput=true, debugOutput=false), task shape at FakeEmrManifest.java:17-30
(``variables`` required by the Java parser; we default it to {} and note the
divergence), Ruby emitter at verification.rb:28-40.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class Task:
    script: str
    variables: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> Task:
        if "script" not in d:
            raise ValueError("task missing required key 'script'")
        variables = d.get("variables", {})
        if not isinstance(variables, dict):
            raise ValueError("task 'variables' must be an object")
        return cls(script=d["script"], variables={str(k): str(v) for k, v in variables.items()})


@dataclass
class Manifest:
    tasks: list[Task] = field(default_factory=list)
    enable_hadoop: bool = False  # false (default) = dry-run/validate-only
    verbose_output: bool = True
    debug_output: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> Manifest:
        # A missing 'tasks' key is a malformed manifest, not an empty run:
        # accepting it silently made e.g. {"script": "x.hql"} (a task object
        # passed where a manifest belongs - an easy CLI mistake) "succeed"
        # with zero statements executed and exit 0. An explicitly empty
        # "tasks": [] stays legal.
        if "tasks" not in d:
            raise ValueError("manifest missing required key 'tasks'")
        return cls(
            tasks=[Task.from_dict(t) for t in d["tasks"]],
            enable_hadoop=bool(d.get("enableHadoop", False)),
            verbose_output=bool(d.get("verboseOutput", True)),
            debug_output=bool(d.get("debugOutput", False)),
        )

    @classmethod
    def from_json(cls, text: str) -> Manifest:
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_file(cls, path: str) -> Manifest:
        with open(path, encoding="utf-8") as f:
            return cls.from_json(f.read())

    def to_dict(self) -> dict:
        return {
            "enableHadoop": self.enable_hadoop,
            "verboseOutput": self.verbose_output,
            "debugOutput": self.debug_output,
            "tasks": [{"script": t.script, "variables": t.variables} for t in self.tasks],
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

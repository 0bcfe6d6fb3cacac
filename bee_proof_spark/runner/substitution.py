"""Hive-style ``${VAR}`` substitution (reference: ManifestRunner.java:234,
README.md:56; semantics follow Hive's public VariableSubstitution contract).

Namespaces: ``${hivevar:NAME}`` (task variables), ``${hiveconf:KEY}`` (session
conf set via SET), ``${env:NAME}``, ``${system:NAME}``. A bare ``${NAME}``
resolves hivevar first, then hiveconf. Unresolvable references are left
verbatim (Hive behavior). Substitution is iterated so variables may reference
other variables, capped at MAX_DEPTH like Hive's 40-round limit.
"""

from __future__ import annotations

import os
import re

_PATTERN = re.compile(r"\$\{([^}${]+)\}")
MAX_DEPTH = 40


class SubstitutionError(RuntimeError):
    """Raised when variable expansion exceeds MAX_DEPTH rounds (cyclic or
    pathologically chained definitions). Mirrors Hive's VariableSubstitution
    fail-fast: 'Substitution exceeds 40 iterations'; the runner wraps this
    into a StatementError so the script aborts instead of silently running a
    partially-expanded statement."""


def substitute(
    text: str,
    variables: dict[str, str] | None = None,
    conf: dict[str, str] | None = None,
) -> str:
    variables = variables or {}
    conf = conf or {}

    def resolve(name: str) -> str | None:
        if name.startswith("hivevar:"):
            return variables.get(name[len("hivevar:"):])
        if name.startswith("hiveconf:"):
            return conf.get(name[len("hiveconf:"):])
        if name.startswith("env:"):
            return os.environ.get(name[len("env:"):])
        if name.startswith("system:"):
            return os.environ.get(name[len("system:"):])
        if name in variables:
            return variables[name]
        return conf.get(name)

    for _ in range(MAX_DEPTH):
        changed = False

        def repl(m: re.Match) -> str:
            nonlocal changed
            val = resolve(m.group(1))
            if val is None:
                return m.group(0)
            changed = True
            return val

        new = _PATTERN.sub(repl, text)
        if not changed:
            return new
        text = new
    raise SubstitutionError(
        f"Substitution exceeds {MAX_DEPTH} iterations (cyclic variable "
        f"definition?): {text[:200]!r}"
    )

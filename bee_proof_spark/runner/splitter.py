"""Quote/comment-aware HQL statement splitting.

The reference delegates this to Hive's CliDriver (';'-separated statements,
``--`` line comments; ManifestRunner.java:236). We track enough lexical state
to never split inside single/double-quoted strings (with backslash escapes),
backtick identifiers, or comments, and we record each statement's 1-based
start line for error addressing (README.md:76 shows Hive's line:char errors).
"""

from __future__ import annotations

from dataclasses import dataclass

from bee_proof_spark.runner.comments import skip_block_comment


@dataclass(frozen=True)
class Statement:
    text: str
    line: int  # 1-based line of the first non-whitespace char


def split_statements(script: str) -> list[Statement]:
    """Split a script into ';'-terminated statements.

    Handles: '...' and "..." strings with backslash escapes, `backtick`
    identifiers, ``--`` line comments, ``/* */`` block comments - NESTED
    and consumed whole via the shared skip_block_comment scanner (r8; a
    per-char state machine here drifted from the classifier's scanner
    twice: first-close splitting, then the '/*/' opener-reread bug the
    round's review caught). Comments are kept inside statement text
    (Spark's parser accepts them); a statement that is only
    whitespace/comments is dropped.
    """
    statements: list[Statement] = []
    buf: list[str] = []
    line = 1
    start_line: int | None = None
    has_content = False
    i, n = 0, len(script)
    state = "plain"  # plain | squote | dquote | btick | lcomment

    def flush() -> None:
        nonlocal buf, start_line, has_content
        text = "".join(buf).strip()
        if text and has_content:
            statements.append(Statement(text, start_line or 1))
        buf = []
        start_line = None
        has_content = False

    while i < n:
        c = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if c == "\n":
            line += 1
            if state == "lcomment":
                state = "plain"
        if state == "plain":
            if c == ";":
                flush()
                i += 1
                continue
            if c == "-" and nxt == "-":
                state = "lcomment"
            elif c == "/" and nxt == "*":
                j = skip_block_comment(script, i)
                seg = script[i:j]
                buf.append(seg)
                line += seg.count("\n")
                i = j
                continue
            else:
                if not c.isspace():
                    if start_line is None:
                        start_line = line
                    has_content = True
                if c == "'":
                    state = "squote"
                elif c == '"':
                    state = "dquote"
                elif c == "`":
                    state = "btick"
        elif state == "squote":
            if c == "\\":
                buf.append(c)
                i += 1
                if i < n:
                    if script[i] == "\n":
                        line += 1
                    buf.append(script[i])
                    i += 1
                continue
            if c == "'":
                state = "plain"
        elif state == "dquote":
            if c == "\\":
                buf.append(c)
                i += 1
                if i < n:
                    if script[i] == "\n":
                        line += 1
                    buf.append(script[i])
                    i += 1
                continue
            if c == '"':
                state = "plain"
        elif state == "btick":
            if c == "`":
                state = "plain"
        buf.append(c)
        i += 1
    flush()
    return statements

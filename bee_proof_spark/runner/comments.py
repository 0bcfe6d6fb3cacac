"""The ONE bracketed-comment scanner all lexical passes share.

Spark's lexer nests bracketed comments (grammar rule BRACKETED_COMMENT:
'/*' (BRACKETED_COMMENT | .)*? '*/'), and three places in the runner must
agree with it exactly: statement splitting (splitter.py), statement-form
classification, and leading-comment stripping (executor.py). Three
hand-rolled scanners is how the r8 review caught the splitter drifting
from the fixed classifier ('/*/' treated as a complete comment because
the opener's '*' was re-read as half a closer) - so the depth tracking
lives here once.
"""

from __future__ import annotations


def skip_block_comment(text: str, i: int) -> int:
    """Given ``i`` at the '/' of a '/*' opener, return the index just past
    the matching '*/', honoring nesting. Both opener chars are consumed
    before scanning resumes, so '/*/' is an UNTERMINATED comment (as in
    Spark's lexer), not a complete one. An unterminated comment consumes
    the rest of the text - the callers must never resurrect trailing
    characters Spark's parser would still consider commented."""
    j, depth, n = i + 2, 1, len(text)
    while j < n and depth:
        if text.startswith("/*", j):
            depth += 1
            j += 2
        elif text.startswith("*/", j):
            depth -= 1
            j += 2
        else:
            j += 1
    return j

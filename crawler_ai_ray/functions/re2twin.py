"""RE2 twins of backtracking Python-re patterns (shared machinery).

Several reference regexes (job_extraction_service.py:752-764 and
:2200-2229) backtrack quadratically on long alpha/space runs — up to
~450 ms on a 2.4 KB page text.  pyarrow.compute runs RE2 (linear time)
with identical leftmost-first + lazy/greedy semantics for the constructs
those patterns use.  Two engine gaps were found by enumerating class
membership over every codepoint (pinned in tests/test_re2_twins.py):

* Python str ``\\s`` accepts 29 codepoints; RE2 ``\\s`` only ASCII.
  ``re2_twin`` substitutes Python's exact whitespace set.
* Python IGNORECASE folds dotted/dotless i (U+0130/U+0131) into
  ``[a-zA-Z]`` and literal ``i``; RE2 does not.  Texts containing either
  codepoint — the ONLY remaining divergence — must take the Python path
  (gate with ``RE2_FALLBACK_RX`` / ``RE2_FALLBACK_CLASS``).
"""

from __future__ import annotations

import re

# Python str \s, spelled out for RE2 (exact 29-codepoint set).
PYWS_RE2_CLASS = (
    r"\x{9}-\x{d}\x{1c}-\x{20}\x{85}\x{a0}\x{1680}\x{2000}-\x{200a}"
    r"\x{2028}-\x{2029}\x{202f}\x{205f}\x{3000}"
)

# The two codepoints where Python-re and RE2 fold tables diverge.
RE2_FALLBACK_CLASS = r"[\x{130}\x{131}]"
RE2_FALLBACK_RX = re.compile("[İı]")


def re2_twin(pattern: str) -> str:
    """Python-re pattern → count/match-identical RE2 pattern (for texts
    free of U+0130/U+0131).  Only valid when every ``\\s`` in ``pattern``
    sits INSIDE a character class — the twin substitutes the bare class
    body."""
    return "(?is)" + pattern.replace(r"\s", PYWS_RE2_CLASS)

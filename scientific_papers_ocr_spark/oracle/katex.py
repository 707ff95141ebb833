"""LaTeX → KaTeX normalisation.

Reference: notion_interface/markdown_to_notion/mathpix_to_katex.py:1-35.
"""

from __future__ import annotations

import re

_BIG_KEYWORDS = ("big", "Big", "bigg", "Bigg")
# (needle, pattern, replacement): every match of \<kw>{...} contains the
# literal "<kw>{", and no keyword's needle occurs inside another keyword's
# match ("\bigg{" does not contain "big{"), so a per-keyword substring test
# is a sound gate for each sub — a false hit (needle without backslash)
# only costs a no-op sub.
_BIG_RES = tuple(
    (f"{kw}{{", re.compile(rf"\\{kw}{{(.*?)}}"), rf"\\{kw} \1")
    for kw in _BIG_KEYWORDS
)

_LEFT_RE = re.compile(r"\\left([(\[{|.\\])")
_RIGHT_RE = re.compile(r"\\right([)\]}|.\\])")


def normalize_katex(text: str) -> str:
    """``\\big{x}`` → ``\\big x`` (4 size variants), then balance ``\\left`` /
    ``\\right`` by appending ``\\right.`` / prepending ``\\left.``.

    Reference: mathpix_to_katex.py:7-35 (``parse``).

    Substring pre-checks gate the regex passes: every ``\\big{``-family
    match ends its keyword with the literal ``g{`` (``\\big{`` ... ``\\Bigg{``)
    and the balance patterns contain ``\\left`` / ``\\right``, so absence of
    the substring is absence of any match — equations without those
    constructs (the overwhelming case) cost two C-level ``in`` tests instead
    of four subs and two findalls.
    """
    if "g{" in text:
        for needle, big_re, repl in _BIG_RES:
            if needle in text:
                text = big_re.sub(repl, text)
    if "\\left" in text or "\\right" in text:
        n_left = len(_LEFT_RE.findall(text))
        n_right = len(_RIGHT_RE.findall(text))
        if n_left > n_right:
            text += "\\right." * (n_left - n_right)
        if n_right > n_left:
            text = "\\left." * (n_right - n_left) + text
    return text

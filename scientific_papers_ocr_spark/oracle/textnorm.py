"""Scalar text normalisation helpers (reference T13-T17, S4 sentinels).

Python-stdlib semantics matter here: ``string.capwords`` is NOT Spark's
``initcap`` (capwords splits on whitespace runs and lowercases the rest), so
these run inside pandas UDFs, never as JVM expressions.
"""

from __future__ import annotations

import re
import string

# In-band sentinels for empty/failed pages.
# Reference: extract_OCR/main_nougat.py:98-111
SENTINEL_EMPTY = "[MISSING_PAGE_EMPTY:{n}]"
SENTINEL_FAIL = "[MISSING_PAGE_FAIL:{n}]"
_SENTINEL_RE = re.compile(r"^\s*\[MISSING_PAGE_(?:EMPTY|FAIL):\d+\]\s*$")

_SQUASH_RE = re.compile(r"\n{3,}")


def squash_newlines(text: str) -> str:
    """Collapse runs of 3+ newlines to exactly two, then strip.

    Reference: rich_docs/edocument_class.py:58,83; main_nougat.py:141.
    """
    # \n{3,} can only match where "\n\n\n" occurs — the C substring test
    # skips the regex machinery for the overwhelmingly common clean case
    if "\n\n\n" not in text:
        return text.strip()
    return _SQUASH_RE.sub("\n\n", text).strip()


def capwords(text: str) -> str:
    """``string.capwords`` — split on whitespace runs, capitalize each word.

    Differs from Spark ``initcap`` (e.g. on ``"foo-bar"`` and repeated
    spaces).  Reference: edocument_class.py:42,65,78; paper_sections.py:28.
    """
    return string.capwords(text)


def capitalize_name(name: str) -> str:
    """Capitalize each part of a name split on spaces and hyphens, keeping
    the separators.  Reference: extract_metadata_from_document.py:49-58.
    """
    parts = re.split(r"(\s|-)", name)
    return "".join(p.capitalize() if p not in (" ", "-") else p for p in parts)


def split_keywords(raw: str | None) -> list[str] | None:
    """PDF-metadata keyword string → capitalised keyword list (T16).

    Reference: elaborate_single_mmd_scientific.py:438-451 (``re.split`` on
    ``[,;]``, strip, ``capitalize_name``); extract_metadata_from_document.py:
    73-80 applies the same split to the author string.
    """
    if raw is None:
        return None
    return [capitalize_name(kw.strip()) for kw in re.split(r"[,;]", raw)]


def is_sentinel_page(text: str) -> bool:
    """True when the turn payload is a bare missing-page sentinel.

    Reference sentinels are emitted wrapped in blank lines
    (main_nougat.py:100,105,110); we accept surrounding whitespace.
    """
    return bool(_SENTINEL_RE.match(text or ""))


_SENTINEL_KIND_RE = re.compile(r"^\s*\[MISSING_PAGE_(EMPTY|FAIL):(\d+)\]\s*$")


def sentinel_kind(text: str) -> str | None:
    """Return ``"empty"`` / ``"fail"`` for sentinel pages, else ``None``.

    The pattern requires the literal ``[MISSING_PAGE_`` — a substring
    pre-check skips the regex for every ordinary page (this runs once per
    turn in the narrow kernel's hot path)."""
    if not text or "[MISSING_PAGE_" not in text:
        return None
    m = _SENTINEL_KIND_RE.match(text)
    if not m:
        return None
    return m.group(1).lower()


def author_from_string(raw: str) -> tuple[str, str]:
    """Parse an author display string into ``(surname, given_name)``.

    Mirrors ``Author.from_string`` + ``Author.__post_init__`` lower-casing:
    split on space → (first, last); else on comma; else all-surname.
    Reference: rich_docs/references/base.py:14-31,53-66.
    """
    if " " in raw:
        bits = raw.split(" ")
        given, surname = bits[0], bits[-1]
    elif "," in raw:
        bits = raw.split(",")
        given, surname = bits[0], bits[-1]
    else:
        given, surname = "", raw
    return (surname or "").lower(), (given or "").lower()


def author_display(surname: str, given_name: str) -> str:
    """``Author.__str__``: ``"Given Surname"`` with ``str.capitalize``.

    Reference: rich_docs/references/base.py:27-28.
    """
    return f"{(given_name or '').capitalize()} {(surname or '').capitalize()}"

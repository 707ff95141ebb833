"""Probe-sentence extraction and layout-block presence scoring.

Mirrors the reference's page-completeness verification (its de-facto online
oracle): sample "meaningful" fixed-length word windows from each OCR layout
block and count how many occur verbatim in the page transcription.

Reference: extract_OCR/extraction_elaboration/static_method_classes.py:13-50,
151-219 and check_single_page.py:64-118,177-208.
"""

from __future__ import annotations

import re

# Words matching this are never accepted inside a probe sentence ("mth", "nth"
# OCR artifacts).  Reference: static_method_classes.py:151-154.
# NOTE: as a boolean, search(word) is exactly `"mth" in word or "nth" in word`
# (the \S* wings match empty), so the hot loop uses the C substring test; the
# pattern is kept as the executable statement of the reference contract.
_BAD_WORD_RE = re.compile(r"\S*[mn]th\S*")

# C-level fast path for counting alphabetic chars in ASCII text: translate
# with this table deletes every ASCII alphabetic char in one pass, so
# alpha = len(text) - len(translated).  Exact for isalpha on ASCII; non-ASCII
# strings fall back to the per-char scan.
_DEL_ASCII_ALPHA = {c: None for c in range(128) if chr(c).isalpha()}

# Trailing characters that disqualify a word.
# Reference: static_method_classes.py:204.
_BAD_TRAILING = set("#$%&'()*+-/<=>?@[\\]^_`{|}~")

# Defaults of CheckPageMissingConfigs (check_single_page.py:64-70).
NUM_PROBES = 3
PROBE_LEN = 6
MAX_NON_ALPHA = 1
MIN_WORD_LEN = 2
MIN_ALPHA_RATIO = 0.7


def is_long_enough(text: str, min_length: int = 150) -> bool:
    """Reference: static_method_classes.py:13-15."""
    return len(text) >= min_length


def is_meaningful(text: str, min_alpha_ratio: float = 0.7, min_avg_word_length: float = 3) -> bool:
    """Alpha-char ratio >= 0.7 AND average word length >= 3.

    Reference: static_method_classes.py:17-25.
    """
    # sum(map(...)) counts True values — same result as the genexpr filter,
    # but the iteration stays in C (this is the narrow stage's hottest loop);
    # ASCII text (the overwhelming case) counts via a single translate pass
    if text.isascii():
        alpha = len(text) - len(text.translate(_DEL_ASCII_ALPHA))
    else:
        alpha = sum(map(str.isalpha, text))
    ratio = alpha / len(text) if text else 0
    words = text.split()
    avg_len = sum(map(len, words)) / len(words) if words else 0
    return ratio >= min_alpha_ratio and avg_len >= min_avg_word_length


def probe_sentences(
    noisy_text: str,
    sentence_length: int = PROBE_LEN,
    max_non_alpha: int = MAX_NON_ALPHA,
    limit: int = 5,
    min_word_len: int = 3,
) -> list[str]:
    """Sliding fixed-length word windows, with the reference's exact rejection
    and position-advance rules (advance past the offending word; the non-alpha
    budget is cumulative within a candidate).

    Reference: static_method_classes.py:156-219 (``extract_meaningful_sentences``).
    """
    accepted: list[str] = []
    words = noisy_text.split()
    pos = 0
    for _ in range(len(words) - sentence_length + 1):
        non_alpha_seen = 0
        # words come from str.split(), so they contain no whitespace and
        # " ".join(cand_words).split() == cand_words — iterate the slice
        # directly instead of join+re-split (hot loop)
        cand_words = words[pos : pos + sentence_length]
        if not cand_words:
            break
        ok = True
        for w_idx, word in enumerate(cand_words):
            if len(word) < min_word_len:
                pos += w_idx + 1
                ok = False
                break
            # islower() is a single C call that is True iff the word has cased
            # chars and none are upper — when True, any(isupper) is False, so
            # the per-char scan only runs for the (rare) non-lowercase words
            if not word.islower() and any(map(str.isupper, word)):
                pos += w_idx + 1
                ok = False
                break
            if not word.isalpha():
                non_alpha_seen += len(word) - sum(map(str.isalpha, word))
                if non_alpha_seen > max_non_alpha:
                    pos += w_idx + 1
                    ok = False
                    break
            # boolean-equivalent C substring test for _BAD_WORD_RE.search
            if "mth" in word or "nth" in word:
                pos += w_idx + 1
                ok = False
                break
            if word[-1] in _BAD_TRAILING:
                pos += w_idx + 1
                ok = False
                break
        if not ok:
            continue
        pos += len(cand_words)
        accepted.append(" ".join(cand_words))
        if len(accepted) >= limit:
            break
    return accepted


def presence_score(
    block_text: str,
    transcription: str,
    max_non_alpha: int = MAX_NON_ALPHA,
    sentence_length: int = PROBE_LEN,
    num_probes: int = NUM_PROBES,
    min_word_len: int = MIN_WORD_LEN,
) -> int:
    """Count of probe sentences found verbatim in the transcription (0..n);
    ``-1`` when fewer than ``num_probes`` probes could be extracted.

    Reference: static_method_classes.py:27-50.
    """
    probes = probe_sentences(
        block_text,
        sentence_length=sentence_length,
        max_non_alpha=max_non_alpha,
        limit=num_probes,
        min_word_len=min_word_len,
    )
    if len(probes) < num_probes:
        return -1
    return sum(1 for s in probes if s in transcription)


def score_block(block_text: str, transcription: str) -> int:
    """Score one layout block against the page transcription with the
    meaningfulness/length pre-gates.

    Reference: check_single_page.py:186-208 (``assign_scores``).
    """
    # both gates return -1, so checking the O(1) length gate before the
    # O(len) alpha scan is result-identical and skips the scan on short
    # blocks (the reference checks meaningfulness first — same outcomes)
    if not is_long_enough(block_text):
        return -1
    if not is_meaningful(block_text):
        return -1
    return presence_score(block_text, transcription)


def completeness_threshold(num_probes: int = NUM_PROBES) -> int:
    """``threshold = max_score - 1`` — a block scoring max-1 still counts as
    complete.  Reference quirk: check_single_page.py:84-90.
    """
    return num_probes - 1


def page_is_incomplete(scores: dict[int, int], num_probes: int = NUM_PROBES) -> bool:
    """Any block with ``0 <= score < threshold`` makes the page incomplete
    (``-1`` blocks are exempt).  Reference: check_single_page.py:177-184.
    """
    thr = completeness_threshold(num_probes)
    return any(0 <= s < thr for s in scores.values())


def incomplete_blocks(scores: dict[int, int], num_probes: int = NUM_PROBES) -> list[int]:
    """Block numbers that drive the repair stage.

    Reference: check_single_page.py:97-99.
    """
    thr = completeness_threshold(num_probes)
    return [k for k, s in scores.items() if 0 <= s < thr]


def group_words_into_blocks(block_nums: list[int], texts: list[str]) -> dict[int, str]:
    """Group OCR word rows by block number, concatenating with a single space
    in scan order; empty/whitespace-only words are skipped.

    Reference: static_method_classes.py:85-108 (``extract_text_by_blocks_OCR``).
    """
    out: dict[int, str] = {}
    for bn, tx in zip(block_nums, texts):
        if not tx or not tx.strip():
            continue
        if bn in out:
            out[bn] += " " + tx
        else:
            out[bn] = tx
    return out

"""Geometric layout analysis of the per-turn layout-token side channel.

The ``tool`` column carries a JSON array of layout blocks (the tesseract
``image_to_data`` analog): one ``level:1`` page block plus ``level:2`` text
blocks with pixel geometry and word streams.

Reference: extract_OCR/extraction_elaboration/pdf_page_layout.py and
check_single_page.py:120-175.
"""

from __future__ import annotations

import json
from typing import Optional

HALF_LEFT = "half_left"
HALF_RIGHT = "half_right"
FULL = "full"
OTHER = "other"


def parse_layout_json(tool_payload: str) -> list[dict]:
    """Decode the ``tool`` side channel; empty/invalid → no blocks."""
    if not tool_payload:
        return []
    try:
        blocks = json.loads(tool_payload)
    except (ValueError, TypeError):
        return []
    return blocks if isinstance(blocks, list) else []


def page_block(blocks: list[dict]) -> Optional[dict]:
    """First ``level == 1`` block wins.

    Reference: check_single_page.py:120-134 (``extract_page_block``).
    """
    for b in blocks:
        if b.get("level") == 1:
            return b
    return None


def text_blocks(blocks: list[dict]) -> dict[int, dict]:
    """``level == 2`` blocks keyed by block number (later duplicates
    overwrite, as in the reference's dict build).

    Reference: check_single_page.py:161-175 (``get_patch_blocks``).
    """
    out: dict[int, dict] = {}
    for b in blocks:
        if b.get("level") == 2:
            out[int(b["block_num"])] = b
    return out


def classify_block(block: dict, page: dict) -> str:
    """HALF_LEFT / HALF_RIGHT / FULL / OTHER classification against the page
    block: width < half page → left/right/straddle by x extents, else full.

    Reference: pdf_page_layout.py:10-28 (``PatchBlockType.get_block_type``).
    """
    if block["w"] < 0.5 * page["w"]:
        if block["x"] < 0.5 * page["w"]:
            if block["x"] + block["w"] < 0.5 * page["w"]:
                return HALF_LEFT
            return OTHER
        return HALF_RIGHT
    return FULL


def column_bounds(column: list[dict]) -> Optional[dict]:
    """Bounding union of a column's blocks.  The reference encodes the union
    with ``y`` = bottommost ``y2`` and a NEGATIVE ``h`` (its crop call swaps
    them back); we store the net crop box ``(x, y, w, h)`` with positive
    height, which is the geometry the crop actually uses.

    Reference: pdf_page_layout.py:97-113 (``_get_column_bounds``) consumed by
    :121-126 (``create_patch_image`` crop (left, top, right, bottom)).
    """
    if not column:
        return None
    x1 = min(b["x"] for b in column)
    x2 = max(b["x"] + b["w"] for b in column)
    y1 = min(b["y"] for b in column)
    y2 = max(b["y"] + b["h"] for b in column)
    return {"x": x1, "y": y1, "w": x2 - x1, "h": y2 - y1}


def split_columns(blocks: list[dict]) -> Optional[dict]:
    """Partition level-2 blocks into left/right half-column groups; ``None``
    when either side is empty (the reference bails out of the repair then).

    Reference: pdf_page_layout.py:41-84 (``get_blocks_in_columns`` +
    ``get_column_dataframe`` empty check).
    """
    page = page_block(blocks)
    if page is None:
        return None
    left: list[dict] = []
    right: list[dict] = []
    for _, b in sorted(text_blocks(blocks).items()):
        kind = classify_block(b, page)
        if kind == HALF_LEFT:
            left.append(b)
        elif kind == HALF_RIGHT:
            right.append(b)
    if not left or not right:
        return None
    return {"left": left, "right": right}


def column_part_texts(blocks: list[dict]) -> Optional[list[str]]:
    """Text-domain analog of the reference's column crop → re-OCR: part 0 is
    the left column's block word-streams joined in block order, part 1 the
    right column's (the reference renders left then right into a 2-page PDF,
    so parts are ordered left, right — check_transcription.py:153-160,
    main.py part writing).

    Word-stream join mirrors ``extract_text_by_blocks_OCR`` (single-space,
    scan order).
    """
    cols = split_columns(blocks)
    if cols is None:
        return None
    parts = []
    for side in ("left", "right"):
        parts.append(" ".join(b.get("text", "") for b in cols[side] if b.get("text", "").strip()))
    return parts

"""Document assembly: flatten parts → pages, segment, build the canonical
cleaned transcription and the EDocument-style JSON record.

Reference: rich_docs/edocument_class.py (transcription / JSON serde),
extract_OCR/extraction_elaboration/check_transcription.py (part flattening /
page reassembly).
"""

from __future__ import annotations

import json
from typing import Optional

from . import layout, markup, probes, segmentation, textnorm


def flatten_parts(part_texts: list[str]) -> str:
    """Join re-extracted column parts with a single space, part order
    ascending.  Reference: check_transcription.py:65-71 (``" ".join`` of
    part-sorted mmds).
    """
    return " ".join(part_texts)


def reassemble_pages(page_texts: dict[int, str]) -> str:
    """Page-number-sorted single-space join of a document's pages.

    Reference: check_transcription.py:104-118.
    """
    ordered = {k: v for k, v in sorted(page_texts.items())}
    return " ".join(ordered.values())


def extract_turn_meta(tool_payload: str) -> Optional[dict]:
    """Document metadata rides in the turn-0 layout side channel as a
    ``level: 0`` record carrying ``{"meta": {...}}`` (the transcript-table
    analog of PDF embedded metadata — SURVEY.md §2.1 S14).
    """
    for rec in layout.parse_layout_json(tool_payload):
        if rec.get("level") == 0 and isinstance(rec.get("meta"), dict):
            return rec["meta"]
    return None


def score_turn(text: str, tool_payload: str) -> dict:
    """Verification scores of one turn: layout word-streams grouped into
    blocks, each scored against the turn transcription.

    Returns block scores, the incomplete-block ids and the turn status
    (``missing_empty`` / ``missing_fail`` / ``incomplete`` / ``complete`` /
    ``unverified`` when the side channel has no level-2 blocks).

    Reference: check_single_page.py:92-118,177-208.
    """
    kind = textnorm.sentinel_kind(text)
    if kind is not None:
        return {"status": f"missing_{kind}", "scores": {}, "incomplete_blocks": []}
    blocks = layout.parse_layout_json(tool_payload)
    lvl2 = layout.text_blocks(blocks)
    if not lvl2:
        return {"status": "unverified", "scores": {}, "incomplete_blocks": []}
    block_nums, texts = [], []
    for bn, b in lvl2.items():
        block_nums.append(bn)
        texts.append(b.get("text", ""))
    grouped = probes.group_words_into_blocks(block_nums, texts)
    scores = {bn: probes.score_block(bt, text) for bn, bt in grouped.items()}
    bad = probes.incomplete_blocks(scores)
    status = "incomplete" if bad else "complete"
    return {"status": status, "scores": scores, "incomplete_blocks": bad}


def repair_turn(text: str, tool_payload: str) -> Optional[list[str]]:
    """Text-domain column repair of an incomplete turn: split the layout
    blocks into half-columns and re-extract each column's word stream as a
    part payload (left, right).  ``None`` when no two-column split exists
    (the reference then keeps the original page).

    Reference: check_transcription.py:141-168 + pdf_page_layout.py:41-113.
    """
    return layout.column_part_texts(layout.parse_layout_json(tool_payload))


def effective_page_text(text: str, tool_payload: str) -> str:
    """Final per-turn page text after verification + repair: incomplete turns
    are replaced by their flattened column parts; everything else passes
    through unchanged.
    """
    verdict = score_turn(text, tool_payload)
    if verdict["status"] != "incomplete":
        return text
    parts = repair_turn(text, tool_payload)
    if parts is None:
        return text
    return flatten_parts(parts)


def _author_tuples(meta: Optional[dict]) -> Optional[list[tuple[str, str]]]:
    if not meta or not meta.get("authors"):
        return None
    return [textnorm.author_from_string(a) for a in meta["authors"]]


def generate_transcription(
    sections: dict[int, dict],
    title: Optional[str],
    authors: Optional[list[tuple[str, str]]],
    abstract: Optional[dict],
    references: Optional[dict],
    include_references: bool = False,
) -> str:
    """Canonical cleaned document text.

    Reference: edocument_class.py:61-84 (``generate_transcription``) +
    paper_sections.py:91-97 (``References.to_string``).
    """
    text = ""
    if title:
        text += f"# {textnorm.capwords(title)}\n\n"
    if authors:
        joined = ", ".join(textnorm.author_display(s, g) for s, g in authors)
        text += f"**{joined}**\n\n"
    if abstract:
        text += f"#### Abstract\n\n{abstract['text']}\n\n"
    for _, section in sections.items():
        text += f"## {textnorm.capwords(section['title'])}\n\n{section['text']}\n\n"
    if include_references and references:
        text += "## References\n\n"
        for n, raw in references["entries"].items():
            text += f"* [{n}] {raw}\n"
    return textnorm.squash_newlines(text)


def _position(page: Optional[int], pos: Optional[int]):
    if page is None:
        return None
    return [page, pos]


def edoc_dict(
    sections: dict[int, dict],
    title: Optional[str],
    authors: Optional[list[tuple[str, str]]],
    creation_date: Optional[float],
    abstract: Optional[dict],
    references: Optional[dict],
    conv_id: str,
    keywords: Optional[list] = None,
) -> dict:
    """EDocument-shaped serde dict: int-keyed (stringified by JSON) section
    map + metadata with datetimes as epoch floats.

    Reference: edocument_class.py:103-107 + basic.py:38-68 +
    paper_sections.py:34-41,130-138 + base.py:134-155; positions serialise as
    ``[page, pos]`` (namedtuples serialise as JSON arrays).
    """
    sect_out = {
        str(k): {
            "start_position": _position(s["start_page"], s["start_pos"]),
            "end_position": _position(s["end_page"], s["end_pos"]),
            "text": s["text"],
            "title": s["title"],
            "number": s["number"],
        }
        for k, s in sections.items()
    }
    abstract_out = None
    if abstract is not None:
        abstract_out = {
            "start_position": _position(abstract["start_page"], abstract["start_pos"]),
            "end_position": _position(abstract["end_page"], abstract["end_pos"]),
            "text": abstract["text"],
            "title": abstract["title"],
            "number": None,
        }
    references_out = None
    if references is not None:
        references_out = {
            "start_position": _position(references["start_page"], references["start_pos"]),
            "end_position": None,
            "text": None,
            "title": references["title"],
            "number": None,
            "references": {
                str(n): {
                    "title": None,
                    "authors": None,
                    "publisher": None,
                    "publication_type": None,
                    "year": None,
                    "date": None,
                    "doi": None,
                    "url": None,
                    "keywords": None,
                    "raw": raw,
                    "reference_complexity_level": 0,
                    "ref_number": n,
                }
                for n, raw in references["entries"].items()
            },
        }
    return {
        "sections": sect_out,
        "metadata": {
            "title": title,
            "authors": [{"surname": s, "given_name": g} for s, g in authors]
            if authors is not None
            else None,
            "creation_date": creation_date,
            "pdf_directory": None,
            "pdf_filename": conv_id,
            "keywords": keywords,
            "abstract": abstract_out,
            "references": references_out,
            "doi": None,
            "publisher": None,
            "publication_type": None,
            "url": None,
        },
    }


def process_document(turns: list[dict], conv_id: str = "") -> dict:
    """Single-node end-to-end oracle for one conversation.

    ``turns``: list of ``{"turn_idx", "text", "tool"}`` dicts (any order; a
    ``part_idx`` key marks column-part rows).  Returns per-turn records and
    the doc-level transcription + EDocument JSON — the golden outputs the
    Spark pipeline must reproduce byte-for-byte.
    """
    # part flattening (S7/S8): part rows shadow the page row
    by_turn: dict[int, dict] = {}
    parts: dict[int, dict[int, str]] = {}
    meta: Optional[dict] = None
    for t in sorted(turns, key=lambda r: (r["turn_idx"], r.get("part_idx") or 0)):
        idx = t["turn_idx"]
        if t.get("part_idx") is not None:
            parts.setdefault(idx, {})[t["part_idx"]] = t["text"]
        else:
            by_turn[idx] = t
        if idx == 0 and meta is None:
            meta = extract_turn_meta(t.get("tool") or "")

    turn_records = []
    pages: dict[int, str] = {}
    for idx in sorted(set(by_turn) | set(parts)):
        base = by_turn.get(idx, {"turn_idx": idx, "text": "", "tool": ""})
        if idx in parts:
            text = flatten_parts([v for _, v in sorted(parts[idx].items())])
            verdict = {"status": "flattened", "scores": {}, "incomplete_blocks": []}
        else:
            text = base["text"]
            verdict = score_turn(text, base.get("tool") or "")
            if verdict["status"] == "incomplete":
                repaired = repair_turn(text, base.get("tool") or "")
                if repaired is not None:
                    text = flatten_parts(repaired)
        pages[idx] = text
        turn_records.append(
            {
                "turn_idx": idx,
                "page_text": text,
                "clean_text": markup.clean_turn_text(text),
                "status": verdict["status"],
                "scores": verdict["scores"],
            }
        )

    ordered_pages = [pages[k] for k in sorted(pages)]
    seg = segmentation.segment_document(ordered_pages)
    title = (meta or {}).get("title")
    authors = _author_tuples(meta)
    creation_date = (meta or {}).get("creation_date")
    transcription = generate_transcription(
        seg["sections"], title, authors, seg["abstract"], seg["references"],
        include_references=True,
    )
    doc_json = json.dumps(
        edoc_dict(
            seg["sections"], title, authors, creation_date,
            seg["abstract"], seg["references"], conv_id=conv_id,
            keywords=textnorm.split_keywords((meta or {}).get("keywords")),
        ),
        indent=4,
        sort_keys=False,
    )
    return {
        "turns": turn_records,
        "segmentation": seg,
        "transcription": transcription,
        "edoc_json": doc_json,
        "meta": meta,
    }

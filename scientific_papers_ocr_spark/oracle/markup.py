"""Markup tokenization: markdown → typed block stream → inline rich-text spans.

This is the reference's markup-boilerplate / DOM-heuristic analog: a turn's
markdown payload is split into TEXT / MATH / HEADER1-3 blocks, math is
normalised, over-long blocks are greedily chunked, and inline spans
(equation / code / bold / italic) are tokenized with lookaround-guarded
Python regexes (which is why all of this stays in pandas UDFs — JVM regex
dialects differ on lookarounds).

Reference: notion_interface/markdown_to_notion/markdown_to_notion_blocks.py.
"""

from __future__ import annotations

import re
from typing import Optional

from .katex import normalize_katex
from .textnorm import squash_newlines

# Block types. Reference: notion_interface/basics/constants.py:36-46.
TEXT = "text"
MATH = "math"
HEADER1 = "header1"
HEADER2 = "header2"
HEADER3 = "header3"

_EQ_WRAP_RE = re.compile(r"\\\((.+?)\\\)")
_CODE_RE = re.compile(r"`(.+?)`")
_BOLD_RE = re.compile(r"\*\*(.+?)\*\*")
_ITALIC_RE = re.compile(r"(?<!\w)(\*|_)(\S.+?\S)\1(?!\w)")
_EQ_SEGMENT_RE = re.compile(r"<equation>.+?</equation>")
_TAG_SPLIT_RE = re.compile(
    r"(\<equation\>)|(\<\/equation\>)|(\<code\>)|(\<\/code\>)"
    r"|(\<bold\>)|(\<\/bold\>)|(\<italic\>)|(\<\/italic\>)"
)
_MATH_OPEN_RE = re.compile(r"\\\[")
_MATH_CLOSE_RE = re.compile(r"\\\]")


def math_block_positions(text: str):
    """Positions of valid ``\\[`` openers / ``\\]`` closers with the
    reference's alternation state machine (first of doubled openers/closers
    wins, unmatched ones skipped).  Returns ``(None, None)`` when the text has
    neither delimiter.

    Reference: markdown_to_notion_blocks.py:376-412.
    """
    # substring pre-check: the regexes match the literal two-char delimiters,
    # so absence of both substrings == no matches; `in` is ~10x cheaper than
    # finditer and paragraphs without display math are the overwhelming case
    if "\\[" not in text and "\\]" not in text:
        return None, None
    opens = [m.start() for m in _MATH_OPEN_RE.finditer(text)]
    closes = [m.end() for m in _MATH_CLOSE_RE.finditer(text)]
    if not opens and not closes:
        return None, None
    merged = sorted(opens + closes)
    valid_open: list[int] = []
    valid_close: list[int] = []
    inside = False
    for p in merged:
        if inside:
            if p in closes:
                valid_close.append(p)
                inside = False
        else:
            if p in opens:
                valid_open.append(p)
                inside = True
    return valid_open, valid_close


def _chunk_candidates(text: str, pattern: str, max_size: int):
    """Greedy accumulation of ``re.split`` keep-delimiter parts up to
    ``max_size``.  Reference: markdown_to_notion_blocks.py:131-147.
    """
    parts = re.split(f"({pattern})", text)
    acc = ""
    last_ok = None
    for i, part in enumerate(parts):
        if len(acc + part) <= max_size:
            acc += part
            last_ok = i
        else:
            break
    if last_ok is not None:
        head = "".join(parts[: last_ok + 1])
        return head, text[len(head):]
    return text, ""


def _chunk_after_period(text: str, max_size: int):
    """Split after the nearest ``". "`` (not followed by a digit) within
    ``max_size`` — including the reference's quirky length test that compares
    the current chunk length plus the delimiter length.

    Reference: markdown_to_notion_blocks.py:149-163.
    """
    acc = ""
    for m in re.finditer(r"\. (?![0-9])", text):
        if len(acc) + len(m.group(0)) <= max_size:
            acc = text[: m.end()]
        else:
            break
    if acc:
        return acc, text[len(acc):]
    return text, ""


def _best_split(text: str, max_size: int):
    """Prefer ``\\n\\n`` over ``\\n`` over sentence-period splits.

    Reference: markdown_to_notion_blocks.py:165-173.
    """
    for pattern in ("\n\n", "\n"):
        if pattern in text:
            head, rest = _chunk_candidates(text, pattern, max_size)
            if head != text:
                return head, rest
    return _chunk_after_period(text, max_size)


def chunk_text(text: str, max_size: int = 1000) -> list[str]:
    """Greedy ≤``max_size`` chunker.  Mirrors the SECOND ``split_text``
    definition in the reference (Python lets the later def shadow the first),
    whose hard-cut branch compares the chunk against the *remaining* text and
    is therefore effectively dead — an unsplittable over-long text is emitted
    as a single over-long chunk.

    Reference: markdown_to_notion_blocks.py:192-206 (shadowing :175-190).
    """
    if len(text) <= max_size:
        return [text]
    chunks: list[str] = []
    while len(text) > max_size:
        head, rest = _best_split(text, max_size)
        if head == rest:
            head = text[:max_size]
            rest = text[max_size:]
        text = rest
        chunks.append(head)
    if text:
        chunks.append(text)
    return chunks


def split_markdown_into_blocks(
    markdown: str, max_len_block: Optional[int] = None
) -> list[dict]:
    """Split a markdown page into typed blocks: paragraphs at ``\\n\\n``,
    display math at validated ``\\[ \\]`` spans, then KaTeX-normalise math,
    drop blank blocks, chunk over-long ones, and classify ``#`` headers
    (``###`` checked before ``##`` before ``#``).

    Quirk preserved: when a MATH block is chunked, the reference appends the
    same mutable dict for every chunk, so all of its emitted copies end up
    holding the LAST chunk's content.

    Reference: markdown_to_notion_blocks.py:285-374 (``split_mathpix_markdown_
    into_blocks`` + ``parse_blocks`` + ``parse_header_blocks``).
    """
    # intermediates are (type, content) tuples rather than dicts — dicts are
    # only materialized for emitted blocks (this function is the second-
    # hottest frame of the narrow stage); logic and emitted values are
    # unchanged from the two-pass dict form
    if "\\[" not in markdown and "\\]" not in markdown:
        # page-level fast path: no display-math delimiter anywhere, so every
        # paragraph is a TEXT block and the math/katex machinery is dead —
        # emit directly without staging (type, content) tuples.  Blank-block
        # semantics: `not p or p.isspace()` ⟺ `p.strip() == ""` (both are
        # Unicode-whitespace tests), allocation-free.
        if max_len_block is None:
            return [
                _classified_block(TEXT, p)
                for p in markdown.split("\n\n")
                if p and not p.isspace()
            ]
        fast_out: list[dict] = []
        for p in markdown.split("\n\n"):
            if not p or p.isspace():
                continue
            if len(p) > max_len_block:
                fast_out.extend(
                    _classified_block(TEXT, t)
                    for t in chunk_text(p, max_len_block)
                    if t != ""
                )
            else:
                fast_out.append(_classified_block(TEXT, p))
        return fast_out

    raw_blocks: list[tuple[str, str]] = []
    for paragraph in markdown.split("\n\n"):
        # inlined math_block_positions pre-check: paragraphs without either
        # two-char delimiter (the overwhelming case) skip the call entirely
        if "\\[" not in paragraph and "\\]" not in paragraph:
            raw_blocks.append((TEXT, paragraph))
            continue
        opens, closes = math_block_positions(paragraph)
        if opens is None and closes is None:
            raw_blocks.append((TEXT, paragraph))
            continue
        cursor = 0
        for op, cl in zip(opens, closes):
            raw_blocks.append((TEXT, paragraph[cursor:op]))
            raw_blocks.append((MATH, paragraph[op:cl]))
            cursor = cl
        if cursor < len(paragraph):
            raw_blocks.append((TEXT, paragraph[cursor:]))

    out: list[dict] = []
    for btype, content in raw_blocks:
        if content == "":
            continue
        if btype == MATH:
            content = normalize_katex(content.replace("\\[", "").replace("\\]", ""))
        if content.strip() == "":
            continue
        if max_len_block is not None and len(content) > max_len_block:
            pieces = [t for t in chunk_text(content, max_len_block) if t != ""]
            if btype == MATH:
                # mutable-dict quirk: every chunk slot carries the last chunk
                out.extend({"type": MATH, "content": pieces[-1]} for _ in pieces)
            else:
                out.extend(_classified_block(btype, t) for t in pieces)
            continue
        out.append(_classified_block(btype, content))
    return out


def _classified_block(btype: str, content: str) -> dict:
    """Build the emitted block dict, classifying ``#`` headers for TEXT
    blocks (### before ## before #) — the single home of the header contract
    for both the chunked and unchunked emit paths."""
    if btype == TEXT and content and content[0] == "#":
        if content.startswith("###"):
            return {"type": HEADER3, "content": content[3:].strip()}
        if content.startswith("##"):
            return {"type": HEADER2, "content": content[2:].strip()}
        return {"type": HEADER1, "content": content[1:].strip()}
    return {"type": btype, "content": content}


def _classify_header(block: dict) -> dict:
    """``###``/``##``/``#`` prefix → HEADER3/2/1 with prefix stripped;
    dict-in/dict-out adapter over ``_classified_block``.

    Reference: markdown_to_notion_blocks.py:328-347 (``parse_header_blocks``).
    """
    return _classified_block(block["type"], block["content"])


def _tag_inline(text: str) -> str:
    """Inline-span tagging in the reference's fixed order: equations first
    (and masked from later passes), then code, bold, italic.

    Reference: markdown_to_notion_blocks.py:12-66.
    """
    tagged = _EQ_WRAP_RE.sub(r"<equation>\1</equation>", text)
    pieces: list[str] = []
    cursor = 0
    for m in _EQ_SEGMENT_RE.finditer(tagged):
        pieces.append(_format_plain(tagged[cursor : m.start()]))
        pieces.append(m.group())
        cursor = m.end()
    pieces.append(_format_plain(tagged[cursor:]))
    return "".join(pieces)


def _format_plain(segment: str) -> str:
    """code → bold → italic on non-equation segments.

    Reference: markdown_to_notion_blocks.py:43-45.
    """
    segment = _CODE_RE.sub(r"<code>\1</code>", segment)
    segment = _BOLD_RE.sub(r"<bold>\1</bold>", segment)
    return _ITALIC_RE.sub(r"<italic>\2</italic>", segment)


_OPEN_TAGS = {
    "<equation>": ("equation", None),
    "<code>": ("text", "code"),
    "<bold>": ("text", "bold"),
    "<italic>": ("text", "italic"),
}


def rich_text_tokens(text: str) -> list[dict]:
    """Tokenize one text block into inline rich-text tokens
    ``{span_type, content, annotation}`` via the reference's 8-way tag split
    and unclosed-tag state machine; blank tagged parts are dropped, equation
    payloads are KaTeX-normalised.

    Reference: markdown_to_notion_blocks.py:12-25,69-124.
    """
    formatted = _tag_inline(text)
    tokens: list[dict] = []
    open_tag = None
    for part in _TAG_SPLIT_RE.split(formatted):
        if part is None:
            continue
        if part in _OPEN_TAGS:
            open_tag = part
        elif part.startswith("</") and open_tag:
            open_tag = None
        else:
            if open_tag:
                if not part.strip():
                    continue
                span_type, annotation = _OPEN_TAGS[open_tag]
                content = normalize_katex(part) if span_type == "equation" else part
                tokens.append(
                    {"span_type": span_type, "content": content, "annotation": annotation}
                )
            else:
                tokens.append({"span_type": "text", "content": part, "annotation": None})
    return tokens


def clean_turn_text(markdown: str, max_len_block: Optional[int] = None) -> str:
    """Reassembled cleaned text of one turn: the block stream re-joined with
    paragraph breaks (headers keep their semantic level as ``#`` prefixes,
    math re-wrapped in ``\\[ \\]``), newline-squashed.

    This is this engine's canonical "boilerplate-stripped" per-turn text — a
    deterministic function of the reference tokenizer's output, so per-turn
    equality against the oracle is well-defined.
    """
    return render_clean_text(
        split_markdown_into_blocks(markdown, max_len_block=max_len_block)
    )


_HEADER_PREFIX = {HEADER1: "# ", HEADER2: "## ", HEADER3: "### "}


def render_clean_text(blocks: list[dict]) -> str:
    """Rendering half of ``clean_turn_text``, callable on an
    already-computed block list — the narrow stage needs both the blocks and
    the cleaned text, and re-splitting the page for each was its single
    largest avoidable cost."""
    prefix = _HEADER_PREFIX
    rendered: list[str] = []
    for block in blocks:
        btype = block["type"]
        if btype == MATH:
            rendered.append("\\[" + block["content"] + "\\]")
        elif btype in prefix:
            rendered.append(prefix[btype] + block["content"])
        else:
            rendered.append(block["content"])
    return squash_newlines("\n\n".join(rendered))

"""Kernel-equivalence harness: pins the optimized text kernels to goldens.

The r4 optimization round rewrote the hottest oracle kernels
(``split_markdown_into_blocks``, ``probe_sentences``, ``squash_newlines``)
and added a fast JSON serializer (``dumps_indent4``), each verified
byte-identical against its pre-optimization implementation on thousands of
corpus + adversarial texts — but that evidence lived in commit messages.
This test commits the sweep: >=1k mixed corpus/adversarial texts flow
through every kernel and the aggregate output digest must match a PINNED
golden, so the next optimization pass cannot silently change behavior.

``dumps_indent4`` additionally gets a true differential check — stdlib
``json.dumps(..., indent=4)`` IS its spec, so every input is compared
byte-for-byte, golden-free.

If a golden mismatch is INTENDED (a deliberate semantic change to a
kernel), re-pin with:
    python -m tests.test_kernel_equivalence
which prints the current digests.  An unintended mismatch means an
optimization changed behavior — that is the bug this harness exists for.

Goldens are md5 over ``repr`` of each output; ``repr`` of str/int/float/
dict (insertion-ordered) is stable across CPython 3.x.
"""

from __future__ import annotations

import hashlib
import json
import random

import pytest

from scientific_papers_ocr_spark import fixtures
from scientific_papers_ocr_spark.operators import fastjson
from scientific_papers_ocr_spark.oracle import markup, probes, segmentation, textnorm

GOLDEN = {
    "split_markdown_into_blocks": "c7011c755804cabc2ee56695d208cece",
    "split_markdown_into_blocks_chunked": "7ec3bd02735384dc91128d4ddf799bd3",
    "probe_sentences": "1dfaba1634cb72f870eb7a912473fcd0",
    "squash_newlines": "02b43520fbfd46ee39432127b98baa31",
    "dumps_indent4": "dee71d52a8c333f64d3d0beced9b226d",
    "segment_document": "d2c62b4a37805126d0ed7a26e5c8cb57",
    "corpus_signature": "1bfbc4a74cacc553b917f84eef993e9c",
}

_FRAGMENTS = [
    "", " ", "\t", "\n", "\n\n", "\n\n\n", "\n\n\n\n\n", "\r\n", "\u00a0",
    "word", "Word.", "WORD", "w0rd", "a", "I", "e.g.", "i.e.", "etc.",
    "# Heading", "## Subsection 2.1", "### 3.1.4 Deep", "#### too deep",
    "#NoSpace", "# ", "##", "A. Introduction", "1 Introduction",
    "\\[", "\\]", "\\[ x^2 \\]", "\\[\nE = mc^2\n\\]", "\\[ unclosed",
    "stray \\] closer", "$inline$", "$$display$$",
    "\\frac{a}{b}", "\\operatorname{argmax}_{x}", "\\mathbf{W}^{\\top}",
    "\\begin{array}{cc} a & b \\end{array}", "\\tilde{\\theta}",
    "ref. [12]", "[1] A. Author, \"On Things,\" IEEE Trans., 2020.",
    "[23]", "Fig. 3 shows", "Table 2:", "Eq. (7)",
    "References", "REFERENCES", "Bibliography", "Abstract", "ABSTRACT",
    "...", "!!!", "???", "—", "–", "‘quoted’", "“smart”", "|", "||",
    "* bullet", "- dash item", "1. numbered", "2) paren",
    "**bold**", "_ital_", "`code`", "```\nfenced\n```",
    "ß", "ñ", "中文文本", "émigré", "Ωμέγα", "𝔘𝔫𝔦", "🙂",
    "0123456789", "3.14159", "1e-9", "0x1F", "   trailing spaces   ",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "supercalifragilisticexpialidocious " * 3,
    "short. Sentences here. And more of them, yes indeed. Done now.",
]


def _adversarial_texts(n: int, seed: int = 1234) -> list[str]:
    rng = random.Random(seed)
    texts = [
        "",
        " ",
        "\n" * 12,
        "\\[\n" + "x + y\n" * 4 + "\\]",
        "word " * 4000,  # forces the greedy chunker
        ("# Results\n\nBody text here.\n\n" * 40),
    ]
    while len(texts) < n:
        k = rng.randint(1, 60)
        sep = rng.choice(["", " ", "\n", "\n\n"])
        texts.append(sep.join(rng.choice(_FRAGMENTS) for _ in range(k)))
    return texts


def _corpus_texts() -> list[str]:
    rows = fixtures.generate_corpus(num_convs=44, seed=42)
    rows += fixtures.generate_corpus(num_convs=20, seed=7)
    return [r["text"] for r in rows]


def _sweep_texts() -> list[str]:
    texts = _corpus_texts() + _adversarial_texts(750)
    assert len(texts) >= 1000, f"sweep must cover >=1k texts, got {len(texts)}"
    return texts


def _page_lists() -> list[list[str]]:
    """Deterministic page-lists over the sweep corpus for the per-document
    segmentation kernel (abstract/references keyname scans, section
    positions) — grouped with varied lengths so candidate-page prefilters
    see single-page and many-page documents.  No empty list: a document is
    a groupBy(conv_id) group, so it always has >=1 page."""
    texts = _sweep_texts()
    rng = random.Random(17)
    lists: list[list[str]] = []
    i = 0
    while i < len(texts):
        k = rng.randint(1, 8)
        lists.append(texts[i : i + k])
        i += k
    return lists


def _digest(outputs) -> str:
    h = hashlib.md5()
    for out in outputs:
        h.update(repr(out).encode("utf-8", "surrogatepass"))
        h.update(b"\x00")
    return h.hexdigest()


def _json_objects(n: int, seed: int = 99) -> list:
    """Deterministic nested JSON-serialisable objects (the EDocument
    domain: str/int/float/bool/None keys-and-values, nested dicts/lists)."""
    rng = random.Random(seed)

    def value(depth: int):
        roll = rng.random()
        if depth > 3 or roll < 0.35:
            return rng.choice(
                [
                    rng.choice(_FRAGMENTS),
                    rng.randint(-(10**9), 10**9),
                    rng.random() * rng.choice([1, 1e-8, 1e12, -1]),
                    None,
                    True,
                    False,
                    float(rng.randint(0, 100)),
                ]
            )
        if roll < 0.7:
            return {
                rng.choice(_FRAGMENTS) + str(i): value(depth + 1)
                for i in range(rng.randint(0, 5))
            }
        return [value(depth + 1) for _ in range(rng.randint(0, 6))]

    objs: list = [{}, [], {"a": {}}, [[]], {"entries": {"1": "x", "2": "y"}}]
    while len(objs) < n:
        objs.append(value(0))
    return objs


@pytest.mark.slow
def test_corpus_signature_is_stable():
    """The goldens below are only meaningful while the generated sweep
    corpus itself is stable — pin it first so a fixtures change fails HERE
    (re-pin everything) instead of masquerading as a kernel regression."""
    assert _digest(_sweep_texts()) == GOLDEN["corpus_signature"]


@pytest.mark.slow
def test_split_markdown_into_blocks_matches_golden():
    texts = _sweep_texts()
    assert _digest(markup.split_markdown_into_blocks(t) for t in texts) == (
        GOLDEN["split_markdown_into_blocks"]
    )
    # the chunking path (max_len_block) is a separate code path in the
    # fused splitter — sweep it too
    assert _digest(
        markup.split_markdown_into_blocks(t, max_len_block=400) for t in texts
    ) == GOLDEN["split_markdown_into_blocks_chunked"]


@pytest.mark.slow
def test_probe_sentences_matches_golden():
    texts = _sweep_texts()
    assert _digest(probes.probe_sentences(t) for t in texts) == (
        GOLDEN["probe_sentences"]
    )


@pytest.mark.slow
def test_squash_newlines_matches_golden():
    texts = _sweep_texts()
    assert _digest(textnorm.squash_newlines(t) for t in texts) == (
        GOLDEN["squash_newlines"]
    )


@pytest.mark.slow
def test_segment_document_matches_golden():
    """Pins the whole per-document segmentation (find_abstract_start /
    find_references_start candidate-page prefilters, section extraction,
    reference-entry parsing) — the r5 assembly-kernel optimizations live
    here."""
    lists = _page_lists()
    assert _digest(segmentation.segment_document(p) for p in lists) == (
        GOLDEN["segment_document"]
    )


@pytest.mark.slow
def test_dumps_indent4_differential_and_golden():
    """stdlib json IS the spec: byte-for-byte equality on every object, not
    just a digest — plus the digest pin for cross-round stability."""
    objs = _json_objects(1000)
    outs = []
    for obj in objs:
        fast = fastjson.dumps_indent4(obj)
        assert fast == json.dumps(obj, indent=4), repr(obj)[:200]
        outs.append(fast)
    assert _digest(outs) == GOLDEN["dumps_indent4"]


def _print_current_digests() -> None:
    texts = _sweep_texts()
    print(f'    "split_markdown_into_blocks": "{_digest(markup.split_markdown_into_blocks(t) for t in texts)}",')
    print(f'    "split_markdown_into_blocks_chunked": "{_digest(markup.split_markdown_into_blocks(t, max_len_block=400) for t in texts)}",')
    print(f'    "probe_sentences": "{_digest(probes.probe_sentences(t) for t in texts)}",')
    print(f'    "squash_newlines": "{_digest(textnorm.squash_newlines(t) for t in texts)}",')
    print(f'    "dumps_indent4": "{_digest(fastjson.dumps_indent4(o) for o in _json_objects(1000))}",')
    print(f'    "segment_document": "{_digest(segmentation.segment_document(p) for p in _page_lists())}",')
    print(f'    "corpus_signature": "{_digest(texts)}",')


if __name__ == "__main__":
    _print_current_digests()

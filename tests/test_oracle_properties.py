"""Property-based tests (hypothesis) for the oracle's stateful text
machinery — invariants that must hold on arbitrary input, not just fixtures."""

import re
import string

from hypothesis import example, given, settings, strategies as st

from scientific_papers_ocr_spark.oracle import katex, markup, probes, segmentation, textnorm

TEXTISH = st.text(
    alphabet=string.ascii_letters + string.digits + " \n*_`\\[]().#$%&",
    max_size=400,
)
WORDS = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10)


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_squash_idempotent(text):
    once = textnorm.squash_newlines(text)
    assert textnorm.squash_newlines(once) == once
    assert "\n\n\n" not in once


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_math_positions_alternate(text):
    opens, closes = markup.math_block_positions(text)
    if opens is None:
        assert closes is None
        return
    # validated delimiters strictly alternate and pair off in order
    assert len(closes) <= len(opens) <= len(closes) + 1
    for o, c in zip(opens, closes):
        assert o < c
    for c, o_next in zip(closes, opens[1:]):
        assert c <= o_next


@settings(max_examples=200, deadline=None)
@given(TEXTISH, st.integers(min_value=20, max_value=200))
def test_chunker_reconstructs_exactly(text, max_size):
    chunks = markup.chunk_text(text, max_size=max_size)
    assert "".join(chunks) == text
    assert all(c != "" for c in chunks) or text == ""


@settings(max_examples=200, deadline=None)
@given(st.lists(WORDS, max_size=40))
def test_probe_sentences_are_substrings(words):
    text = " ".join(words)
    for probe in probes.probe_sentences(text, sentence_length=4, limit=5, min_word_len=2):
        assert probe in text
        # reference quirk: rejection-driven pos advance can leave a trailing
        # window SHORTER than sentence_length, and it is still accepted
        # (static_method_classes.py:171-213 — the range() bound caps
        # iterations, not window length)
        assert 1 <= len(probe.split()) <= 4


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_probe_score_bounds(block):
    s = probes.presence_score(block, block)
    assert s in (-1, 0, 1, 2, 3)
    if s >= 0:
        # every extracted probe is inside the block itself → full score
        assert s == 3


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_katex_balances_left_right(text):
    out = katex.normalize_katex(text)
    lefts = len(re.findall(r"\\left([(\[{|.\\])", out))
    rights = len(re.findall(r"\\right([)\]}|.\\])", out))
    assert lefts == rights


@settings(max_examples=200, deadline=None)
@given(TEXTISH)
def test_blocks_never_empty_content(text):
    for b in markup.split_markdown_into_blocks(text):
        if b["type"] == markup.TEXT:
            assert b["content"] != ""


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXTISH, min_size=1, max_size=6))
def test_segment_document_total(pages):
    """Segmentation must never crash and always yields >= 1 section."""
    seg = segmentation.segment_document(pages)
    assert len(seg["sections"]) >= 1
    for s in seg["sections"].values():
        assert isinstance(s["title"], str)
        assert isinstance(s["number"], str)


@settings(max_examples=100, deadline=None)
@given(st.lists(WORDS, min_size=1, max_size=8))
def test_rich_text_roundtrip_plain(words):
    """Plain text (no markup chars) must come back as one untagged token."""
    text = " ".join(words)
    toks = markup.rich_text_tokens(text)
    assert [t["annotation"] for t in toks] == [None] * len(toks)
    assert "".join(t["content"] for t in toks) == text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + " ,;-", max_size=80))
def test_split_keywords_total_and_capitalized(raw):
    # T16: never crashes, covers the full input (separators removed), every
    # keyword is capitalize_name-normalized
    kws = textnorm.split_keywords(raw)
    assert kws is not None
    assert len(kws) == len(re.split(r"[,;]", raw))
    for kw in kws:
        assert kw == textnorm.capitalize_name(kw.strip())


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + ' .,"[]_-', max_size=160))
def test_parse_citation_never_crashes(raw):
    from scientific_papers_ocr_spark.operators.references import parse_citation

    got = parse_citation(raw)
    assert set(got) == {"title", "authors", "venue", "year"}
    if got["year"] is not None:
        assert 1800 <= got["year"] <= 2099
    if got["authors"] is not None:
        assert got["authors"] and all(a for a in got["authors"])


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.binary(min_size=0, max_size=32),
)
def test_resize_bilinear_bounds_and_shape(w, h, out_w, out_h, payload):
    """Bilinear resample invariants on arbitrary sizes: output shape is
    exactly (out_h, out_w, 3); every output pixel lies within the input's
    [min, max] (convex interpolation never extrapolates); identity resize
    is exact."""
    import numpy as np

    from scientific_papers_ocr_spark.operators import multimodal

    img = multimodal._fake_decode_pixels(payload, w, h)
    out = multimodal.resize_bilinear(img, out_w, out_h)
    assert out.shape == (out_h, out_w, 3)
    assert out.dtype == np.uint8
    assert out.min() >= img.min() and out.max() <= img.max()
    assert np.array_equal(multimodal.resize_bilinear(img, w, h), img)


# --- fastjson: byte parity with stdlib json.dumps(indent=4) -----------------

JSON_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**30), max_value=10**30),
    st.floats(allow_nan=True, allow_infinity=True),
    st.text(max_size=30),
)
JSON_VALUES = st.recursive(
    JSON_SCALARS,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=10), children, max_size=5),
    ),
    max_leaves=25,
)


@given(JSON_VALUES)
@settings(max_examples=300)
def test_fastjson_matches_stdlib(obj):
    import json

    from scientific_papers_ocr_spark.operators import fastjson

    assert fastjson.dumps_indent4(obj) == json.dumps(obj, indent=4)


def test_fastjson_fallback_domain():
    """Objects outside the fast domain (tuples, non-str keys, subclasses)
    must still match stdlib via the wholesale fallback."""
    import json

    from scientific_papers_ocr_spark.operators import fastjson

    class OddStr(str):
        pass

    for obj in [
        (1, 2, 3),
        {1: "intkey", True: "boolkey"},
        {"t": (1, "a", None)},
        [OddStr("sub")],
        {"nested": {2.5: ["floatkey"]}},
    ]:
        assert fastjson.dumps_indent4(obj) == json.dumps(obj, indent=4)


@example("mth")
@example("nth word")
@example("smooth nthing")
@example(" m th\tnth ")
@given(st.text(alphabet="mnth aeiX.", max_size=20))
@settings(max_examples=500)
def test_bad_word_regex_substring_equivalence(word):
    """probes.probe_sentences rejects bad words via a C substring test; this
    pins its boolean equivalence to the reference pattern _BAD_WORD_RE
    (\\S*[mn]th\\S* — the wings match empty, so a match exists iff the text
    contains 'mth' or 'nth')."""
    from scientific_papers_ocr_spark.oracle.probes import _BAD_WORD_RE

    assert bool(_BAD_WORD_RE.search(word)) == ("mth" in word or "nth" in word)


# page-text-ish strategy for the keyname-scan equivalences: biased toward
# the substrings the r5 candidate-page prefilters key on
_KEYNAMEISH = st.text(
    alphabet=string.ascii_letters + " \n#_:-" + "bstrace",
    max_size=60,
).map(lambda s: s.replace("bst", "bstract" if len(s) % 2 else "bst"))
_PAGEISH = st.lists(
    st.one_of(
        _KEYNAMEISH,
        st.sampled_from(
            [
                "# Abstract", "##Abstract", "_abstract_", "_Abstract:_",
                "_Abstract--_", "bstract", "Abstrac", "ABSTRACT",
                "# References", "##References", "_references_",
                "_References:_", "_REFERENCES--_", "ReFeReNcEs",
                "references:", "Reference", "\n## References\n\n", "",
            ]
        ),
    ),
    max_size=8,
)


@settings(max_examples=500, deadline=None)
@given(_PAGEISH)
def test_find_abstract_start_prefilter_equivalence(pages):
    """find_abstract_start's candidate-page prefilter ('bstract' substring)
    must be observationally identical to the naive variation-major scan it
    replaced (reference: elaborate_single_mmd_scientific.py:578-591)."""
    names = segmentation.keyname_variations("Abstract") + (
        segmentation.keyname_variations("abstract")
    )

    def naive(ps):
        for name in names:
            for page_number, page in enumerate(ps):
                if name in page:
                    return {
                        "page_number": page_number,
                        "key_name": name,
                        "match_pos": page.find(name),
                    }
        return None

    assert segmentation.find_abstract_start(pages) == naive(pages)


@settings(max_examples=500, deadline=None)
@given(_PAGEISH)
def test_find_references_start_prefilter_equivalence(pages):
    """Same for find_references_start ('references' in the lowered page;
    reverse page order preserved).  Reference:
    elaborate_single_mmd_scientific.py:563-576."""

    def naive(ps):
        lowered = [p.lower() for p in ps]
        for name in segmentation.keyname_variations("References"):
            rx = segmentation._title_pattern(name)
            needle = name.lower()
            for page_number in range(len(ps) - 1, -1, -1):
                if needle not in lowered[page_number]:
                    continue
                m = rx.search(ps[page_number])
                if m is not None:
                    return {
                        "page_number": page_number,
                        "key_name": name,
                        "match_pos": m.start(),
                    }
        return None

    assert segmentation.find_references_start(pages) == naive(pages)

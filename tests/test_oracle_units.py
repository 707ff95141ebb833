"""Unit tests for oracle semantics — the reference's edge cases and quirks
(SURVEY.md §5.2 item 3), written against the behaviors cited in the oracle
docstrings."""

import pytest

from scientific_papers_ocr_spark.oracle import (
    katex,
    layout,
    markup,
    probes,
    segmentation,
    textnorm,
)


class TestTextNorm:
    def test_squash_newlines(self):
        assert textnorm.squash_newlines("a\n\n\n\nb\n\n\nc") == "a\n\nb\n\nc"
        assert textnorm.squash_newlines("\n\n\nx\n\n\n") == "x"

    def test_capwords_differs_from_initcap(self):
        # capwords lowercases the tail and does NOT capitalize after hyphens
        assert textnorm.capwords("foo-bar BAZ") == "Foo-bar Baz"
        assert textnorm.capwords("a  b") == "A B"  # collapses whitespace runs

    def test_capitalize_name_keeps_separators(self):
        assert textnorm.capitalize_name("jean-luc de marco") == "Jean-Luc De Marco"

    def test_split_keywords(self):
        # T16: re.split on [,;] + strip + capitalize_name
        # (elaborate_single_mmd_scientific.py:438-451)
        assert textnorm.split_keywords("graph learning; sparse attention , deep-nets") == [
            "Graph Learning", "Sparse Attention", "Deep-Nets",
        ]
        assert textnorm.split_keywords(None) is None

    def test_sentinels(self):
        assert textnorm.is_sentinel_page("\n\n[MISSING_PAGE_EMPTY:4]\n\n")
        assert textnorm.sentinel_kind("[MISSING_PAGE_FAIL:12]") == "fail"
        assert not textnorm.is_sentinel_page("text [MISSING_PAGE_EMPTY:4]")

    def test_author_parsing(self):
        assert textnorm.author_from_string("Ada Lovelace") == ("lovelace", "ada")
        assert textnorm.author_from_string("solo") == ("solo", "")
        assert textnorm.author_display("lovelace", "ada") == "Ada Lovelace"


class TestProbes:
    def test_pos_advance_past_offending_word(self):
        # "Xx" capitalized rejects the window and advances past it
        text = "aa bb cc Xx dd ee ff gg hh ii jj kk ll mm nn oo pp qq"
        out = probes.probe_sentences(text, sentence_length=6, limit=2, min_word_len=2)
        # first window hits Xx at index 3 -> pos jumps to dd
        assert out[0] == "dd ee ff gg hh ii"

    def test_non_alpha_budget_is_cumulative(self):
        text = "a1b c2d eee fff ggg hhh iii"
        # two words with one non-alpha each exceeds max_non_alpha=1
        out = probes.probe_sentences(text, sentence_length=6, max_non_alpha=1,
                                     limit=3, min_word_len=3)
        assert "a1b" not in " ".join(out)

    def test_mth_nth_rejection(self):
        text = "the mth harmonic wobbles badly today again tomorrow maybe"
        out = probes.probe_sentences(text, sentence_length=3, limit=5, min_word_len=2)
        assert all("mth" not in s for s in out)

    def test_trailing_punct_rejects_but_period_ok(self):
        ok = probes.probe_sentences("aaa bbb ccc.", sentence_length=3, limit=1, min_word_len=3)
        assert ok == ["aaa bbb ccc."]
        bad = probes.probe_sentences("aaa bbb ccc)", sentence_length=3, limit=1, min_word_len=3)
        assert bad == []

    def test_presence_score_bands(self):
        block = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
                "lamda mu nu xi omicron pi rho sigma tau upsilon"
        # all probes present
        assert probes.presence_score(block, block) == 3
        # none present
        assert probes.presence_score(block, "nothing here") == 0
        # too short for 3 probes
        assert probes.presence_score("aa bb cc", "x") == -1

    def test_threshold_is_max_minus_one(self):
        assert probes.completeness_threshold(3) == 2
        # score 2 with threshold 2 counts as complete
        assert not probes.page_is_incomplete({1: 2})
        assert probes.page_is_incomplete({1: 1})
        assert not probes.page_is_incomplete({1: -1})

    def test_group_words_skips_blanks(self):
        got = probes.group_words_into_blocks([1, 1, 2, 2], ["a", " ", "b", "c"])
        assert got == {1: "a", 2: "b c"}


class TestKatex:
    def test_big_braces(self):
        assert katex.normalize_katex("\\big{x}") == "\\big x"
        assert katex.normalize_katex("\\Bigg{yy}") == "\\Bigg yy"

    def test_left_right_balance(self):
        assert katex.normalize_katex("\\left( x") == "\\left( x\\right."
        assert katex.normalize_katex("x \\right)") == "\\left.x \\right)"
        assert katex.normalize_katex("\\left( x \\right)") == "\\left( x \\right)"


class TestMarkup:
    def test_math_positions_doubled_openers(self):
        # doubled opener: first wins, second skipped
        opens, closes = markup.math_block_positions("\\[ \\[ x \\]")
        assert opens == [0]
        assert len(closes) == 1

    def test_math_positions_none(self):
        assert markup.math_block_positions("plain text") == (None, None)

    def test_block_split_headers_order(self):
        blocks = markup.split_markdown_into_blocks("### h3\n\n## h2\n\n# h1\n\nbody")
        kinds = [b["type"] for b in blocks]
        assert kinds == [markup.HEADER3, markup.HEADER2, markup.HEADER1, markup.TEXT]
        assert blocks[0]["content"] == "h3"

    def test_math_block_extraction_and_strip(self):
        blocks = markup.split_markdown_into_blocks("pre \\[a+b\\] post")
        assert [b["type"] for b in blocks] == [markup.TEXT, markup.MATH, markup.TEXT]
        assert blocks[1]["content"] == "a+b"

    def test_empty_blocks_dropped(self):
        blocks = markup.split_markdown_into_blocks("a\n\n\n\nb")
        assert [b["content"] for b in blocks] == ["a", "b"]

    def test_chunker_prefers_paragraph_breaks(self):
        text = ("x" * 600) + "\n\n" + ("y" * 600)
        chunks = markup.chunk_text(text, max_size=1000)
        assert chunks[0] == "x" * 600 + "\n\n"
        assert chunks[1] == "y" * 600

    def test_chunker_dead_hard_cut_quirk(self):
        # unsplittable over-long text comes back as ONE over-long chunk
        # (reference quirk: 2nd split_text definition's hard cut is dead)
        text = "z" * 2500
        assert markup.chunk_text(text, max_size=1000) == [text]

    def test_single_char_italic_not_matched(self):
        # reference pattern \S.+?\S needs >=3 chars of content
        toks = markup.rich_text_tokens("*i* and _j_")
        assert all(t["annotation"] is None for t in toks)

    def test_rich_text_tokens_order_and_guards(self):
        toks = markup.rich_text_tokens("a **b** \\(x\\) `c` *ital* w_x_y")
        kinds = [(t["span_type"], t["annotation"]) for t in toks]
        assert ("text", "bold") in kinds
        assert ("equation", None) in kinds
        assert ("text", "code") in kinds
        assert ("text", "italic") in kinds
        # lookbehind guard: w_x_y must NOT become italic
        flat = "".join(t["content"] for t in toks)
        assert "w_x_y" in flat

    def test_equation_masked_from_bold(self):
        toks = markup.rich_text_tokens("\\(**notbold**\\)")
        eq = [t for t in toks if t["span_type"] == "equation"]
        assert eq and "**notbold**" in eq[0]["content"]

    def test_clean_turn_text_squashes(self):
        out = markup.clean_turn_text("# T\n\n\n\nbody \\[x\\] tail")
        assert "\n\n\n" not in out
        assert out.startswith("# T")


class TestLayout:
    PAGE = {"level": 1, "block_num": 0, "x": 0, "y": 0, "w": 1000, "h": 2000}

    def test_classification(self):
        assert layout.classify_block({"x": 10, "y": 0, "w": 300, "h": 10}, self.PAGE) == layout.HALF_LEFT
        assert layout.classify_block({"x": 600, "y": 0, "w": 300, "h": 10}, self.PAGE) == layout.HALF_RIGHT
        assert layout.classify_block({"x": 300, "y": 0, "w": 300, "h": 10}, self.PAGE) == layout.OTHER
        assert layout.classify_block({"x": 0, "y": 0, "w": 700, "h": 10}, self.PAGE) == layout.FULL

    def test_column_bounds(self):
        bounds = layout.column_bounds(
            [{"x": 10, "y": 20, "w": 100, "h": 30}, {"x": 5, "y": 60, "w": 50, "h": 40}]
        )
        assert bounds == {"x": 5, "y": 20, "w": 105, "h": 80}

    def test_split_columns_requires_both_sides(self):
        blocks = [self.PAGE, {"level": 2, "block_num": 1, "x": 10, "y": 0, "w": 300, "h": 10, "text": "l"}]
        assert layout.split_columns(blocks) is None

    def test_part_texts_left_then_right(self):
        blocks = [
            self.PAGE,
            {"level": 2, "block_num": 1, "x": 10, "y": 0, "w": 300, "h": 10, "text": "left words"},
            {"level": 2, "block_num": 2, "x": 600, "y": 0, "w": 300, "h": 10, "text": "right words"},
        ]
        assert layout.column_part_texts(blocks) == ["left words", "right words"]


class TestSegmentation:
    PAGES = [
        "# Title\n\nintro text here\n\n## Abstract\n\nthe abstract body text\n\nmore\n\n",
        "\n## 1. Methods\n\nmethod body\n\n\n## 2. Results\n\nresult body\n\n",
        "\n## References\n\n[1] ref one\n\n[2] ref two\n\n",
    ]

    def test_abstract_keyname_priority(self):
        hit = segmentation.find_abstract_start(["x _Abstract_ y", "## Abstract\n\nz"])
        # '## Abstract' variation is tried before '_Abstract_'
        assert hit["page_number"] == 1
        assert hit["key_name"] == "## Abstract"

    def test_references_reverse_scan(self):
        hit = segmentation.find_references_start(
            ["## References\n\nearly", "body", "## References\n\nlate"]
        )
        assert hit["page_number"] == 2

    def test_reference_entries(self):
        entries = segmentation.parse_reference_entries("[1] a b\n\n[2] c d\n* x")
        assert entries == {1: "a b", 2: "c d"}

    def test_full_document(self):
        seg = segmentation.segment_document(self.PAGES)
        assert seg["abstract"] is not None
        assert seg["references"] is not None
        assert seg["references"]["entries"] == {1: "ref one", 2: "ref two"}
        secs = seg["sections"]
        assert len(secs) == 2
        assert secs[1]["title"] == ". Methods"  # lstrip('1') quirk keeps '. '
        assert secs[1]["number"] == "1"
        assert secs[2]["number"] == "2"

    def test_numeral_styles(self):
        # quirk: "2." has no cased chars and isdigit() is False, so dotted
        # ARABIC numerals fall back to the ordinal while dotted ROMAN ones
        # take the roman path (reference :176-186)
        assert segmentation.render_section_number("2.", 2, 0) == "1"
        assert segmentation.render_section_number("2", 2, 0) == "2"
        assert segmentation.render_section_number("II.", 2, 0) == "II"
        assert segmentation.render_section_number("ii.", 2, 0) == "ii"
        assert segmentation.render_section_number(None, 2, 0) == ""
        assert segmentation.render_section_number("1)", 2, 4) == "5"

    def test_lstrip_charset_quirk(self):
        assert segmentation.clean_section_title("II. Methods", "II") == ". Methods"

    def test_bare_doc_full_text_fallback(self):
        seg = segmentation.segment_document(["just text\n\nno headers"])
        assert list(seg["sections"].keys()) == [1]
        assert seg["sections"][1]["title"] == "Full Text"

    def test_no_abstract_clamped_start(self):
        pages = ["## 1. Intro\n\nbody\n\n", "## References\n\n[1] r\n\n"]
        # code-as-written would crash (range(None, ...)); clamped semantics:
        seg = segmentation.segment_document(["x\n\n" + pages[0], pages[1]])
        assert seg["abstract"] is None
        assert seg["references"] is not None

    def test_to_roman(self):
        assert segmentation.to_roman(4) == "IV"
        assert segmentation.to_roman(1990) == "MCMXC"
        with pytest.raises(ValueError):
            segmentation.to_roman(0)

"""End-to-end equality: Spark pipeline output vs the single-node oracle.

The north-rule correctness contract — per-turn text equality under stable
(conv_id, turn_idx) ordering, plus doc-level transcription and EDocument
JSON byte-equality — checked over the full seeded fixture corpus.
"""

import pytest

from scientific_papers_ocr_spark import fixtures, pipeline
from scientific_papers_ocr_spark.oracle import assembly, textnorm
from scientific_papers_ocr_spark.sources import transcripts as tsrc

NUM_CONVS = 33
SEED = 42


@pytest.fixture(scope="module")
def corpus_rows():
    return fixtures.generate_corpus(num_convs=NUM_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def oracle_results(corpus_rows):
    convs = {}
    for r in corpus_rows:
        convs.setdefault(r["conv_id"], []).append(r)
    return {
        cid: assembly.process_document(rows, conv_id=cid)
        for cid, rows in convs.items()
    }


@pytest.fixture(scope="module")
def spark_results(spark, corpus_rows):
    df = tsrc.corpus_dataframe(spark, num_convs=NUM_CONVS, seed=SEED)
    out = pipeline.run_pipeline(spark, df, output_dir=None, num_buckets=8)
    turns = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in out["turns"].collect()
    }
    docs = {r["conv_id"]: r.asDict() for r in out["docs"].collect()}
    return {"turns": turns, "docs": docs}


def test_per_turn_text_equality(oracle_results, spark_results):
    checked = 0
    for cid, oracle in oracle_results.items():
        for t in oracle["turns"]:
            key = (cid, t["turn_idx"])
            assert key in spark_results["turns"], f"missing turn {key}"
            got = spark_results["turns"][key]
            assert got["page_text"] == t["page_text"], f"page_text mismatch at {key}"
            assert got["clean_text"] == t["clean_text"], f"clean_text mismatch at {key}"
            assert got["status"] == t["status"], f"status mismatch at {key}"
            checked += 1
    assert checked == len(spark_results["turns"]) and checked > 100


def test_doc_transcription_equality(oracle_results, spark_results):
    for cid, oracle in oracle_results.items():
        got = spark_results["docs"][cid]
        assert got["transcription"] == oracle["transcription"], f"transcription mismatch {cid}"


def test_edoc_json_equality(oracle_results, spark_results):
    for cid, oracle in oracle_results.items():
        oracle_json = assembly.json.dumps(
            assembly.edoc_dict(
                oracle["segmentation"]["sections"],
                (oracle["meta"] or {}).get("title"),
                assembly._author_tuples(oracle["meta"]),
                (oracle["meta"] or {}).get("creation_date"),
                oracle["segmentation"]["abstract"],
                oracle["segmentation"]["references"],
                conv_id=cid,
                keywords=textnorm.split_keywords(
                    (oracle["meta"] or {}).get("keywords")
                ),
            ),
            indent=4,
        )
        assert spark_results["docs"][cid]["edoc_json"] == oracle_json, f"edoc mismatch {cid}"


def test_keywords_present_in_edoc(oracle_results, spark_results):
    """T16: keyword-bearing fixture convs carry split+capitalised keywords in
    the EDocument metadata (and keyword-less ones stay null)."""
    import json

    seen = 0
    for cid, oracle in oracle_results.items():
        raw = (oracle["meta"] or {}).get("keywords")
        got = json.loads(spark_results["docs"][cid]["edoc_json"])["metadata"]["keywords"]
        if raw is None:
            assert got is None
        else:
            assert got == textnorm.split_keywords(raw)
            assert all(kw == textnorm.capitalize_name(kw) for kw in got)
            seen += 1
    assert seen > 0, "fixture corpus should include keyword-bearing convs"


def test_status_coverage(spark_results):
    statuses = {t["status"] for t in spark_results["turns"].values()}
    assert {"complete", "incomplete", "unverified"} <= statuses
    assert any(s.startswith("missing") for s in statuses)


def test_span_positions_match_oracle(oracle_results, spark_results):
    for cid, oracle in oracle_results.items():
        got = spark_results["docs"][cid]
        sections = {s["section_key"]: s for s in got["sections"]}
        for k, s in oracle["segmentation"]["sections"].items():
            g = sections[k]
            assert g["start"]["turn_idx"] == s["start_page"]
            assert g["start"]["pos"] == s["start_pos"]
            assert g["title"] == s["title"]
            assert g["number"] == s["number"]
            assert g["text"] == s["text"]


def test_unicode_pages_byte_parity(spark):
    """Real transcripts are not ASCII: CJK headings, emoji, combining
    accents and RTL text must flow through tokenize → verify → clean →
    segmentation → EDocument serde with the SAME bytes the single-node
    oracle produces.  Position arithmetic must agree between Python (str
    code points), Spark SQL (substr/length count characters), and the
    Arrow boundary — a byte-offset anywhere breaks section spans."""
    import datetime

    # headings sit mid-page: the reference's section regex (\n## ...\n\n,
    # segmentation.py:32) requires a preceding newline, so page-LEADING
    # headings are invisible -- a quirk both engines must agree on
    pages = [
        "# \u00c9tude des syst\u00e8mes \u5206\u6563\u578b\n\nAbstract\n\nR\u00e9sum\u00e9 \U0001f389 de l'\u00e9tude \u2014 "
        "\u00dcberblick \u00fcber die Systeme, na\u0131ve \u00e9lan.\n\n",
        "Vorwort intro \u00b6.\n\n## 1. M\u00e9thode \u4e2d\u6587\u65b9\u6cd5\n\nDonn\u00e9es: \u03b1, \u03b2, \u03b3 \u2014 "
        "\u6570\u636e\u5904\u7406 with mixed \u05e8\u05b4\u05d1\u05bc\u05d5\u05bc\u05e2\u05b7 RTL and e\u0301 combining accents.\n\n"
        "Second \u00b6 paragraph \U0001f680.\n\n",
        "Zwischentext.\n\n## 2. Ergebnisse \u7d50\u679c\n\n\u03a3\u03c5\u03bc\u03c0\u03b5\u03c1\u03ac\u03c3\u03bc\u03b1\u03c4\u03b1: \u224842\u2030 of "
        "cases, na\u00efve vs na\u0131\u0308ve, \ufb01 ligature, \ufb02ow.\n\n",
        "Schluss.\n\n## References\n\n[1] \u03a9. \u00dc\u00f1\u00ee, and \u00c6. \u00d8re, "
        "\"\u00cbx\u00e2mple\u2014\u30d1\u30bf\u30fc\u30f3\u8a8d\u8b58,\" _\u00dcn\u00efv\u00e9rsit\u00e9_, 2020.\n",
    ]
    rows = [
        {
            "conv_id": "conv-uni-0",
            "turn_idx": i,
            "role": ("user", "assistant")[i % 2],
            "text": p,
            "tool": "",
            "ts": datetime.datetime(2024, 1, 1, 0, 0, i),
        }
        for i, p in enumerate(pages)
    ]
    oracle = assembly.process_document(
        [dict(r) for r in rows], conv_id="conv-uni-0"
    )

    from scientific_papers_ocr_spark import schemas

    df = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)
    out = pipeline.run_pipeline(spark, df, output_dir=None, num_buckets=4)
    turns = {r["turn_idx"]: r for r in out["turns"].collect()}
    assert len(turns) == len(pages)
    for t in oracle["turns"]:
        got = turns[t["turn_idx"]]
        assert got["page_text"] == t["page_text"], t["turn_idx"]
        assert got["clean_text"] == t["clean_text"], t["turn_idx"]
        assert got["status"] == t["status"], t["turn_idx"]

    doc = out["docs"].first()
    assert doc["transcription"] == oracle["transcription"]
    oracle_json = assembly.json.dumps(
        assembly.edoc_dict(
            oracle["segmentation"]["sections"],
            None, None, None,
            oracle["segmentation"]["abstract"],
            oracle["segmentation"]["references"],
            conv_id="conv-uni-0",
            keywords=None,
        ),
        indent=4,
    )
    assert doc["edoc_json"] == oracle_json
    # the unicode section headings survived segmentation with exact spans
    assert doc["n_sections"] >= 2


def test_fuzzed_pages_byte_parity(spark):
    """Seeded junk-page fuzz: arbitrary character soup (markup fragments,
    sentinels-adjacent tokens, unicode, unbalanced math delimiters) through
    the full pipeline must byte-match the oracle — robustness beyond the
    crafted fixture shapes.  All conversations ride one DataFrame / one
    pipeline run."""
    import datetime
    import random

    import json as _json

    from scientific_papers_ocr_spark import fixtures

    alph = list("abc ABC\n#*_`$[](){}.,;:!?\"'\\/-=+0123456789") + [
        "é", "中", "\U0001f389", "א", "́", "ﬁ",
        "\n\n", "## ", "[1] ", "Abstract", "References", "$$", "mth ", "nth ",
    ]
    all_rows, per_conv = [], {}
    for seed in range(12):
        rng = random.Random(seed)
        cid = f"fuzz-{seed}"
        rows = []
        for i in range(rng.randint(1, 6)):
            page = "".join(rng.choice(alph) for _ in range(rng.randint(0, 400)))
            # layout side channel fuzz: every verification/repair path plus
            # truncated-JSON junk and turn-0 metadata payloads
            kind = rng.randrange(6)
            if kind == 0:
                tool = ""
            elif kind == 1:
                tool = fixtures._layout_tool(rng, page, complete=True)
            elif kind == 2:
                tool = fixtures._layout_tool(rng, page, complete=False, repairable=True)
            elif kind == 3:
                tool = fixtures._layout_tool(rng, page, complete=False, repairable=False)
            elif kind == 4:
                t = fixtures._layout_tool(rng, page, complete=True)
                tool = t[: rng.randrange(len(t) + 1)]
            else:
                tool = _json.dumps([{"level": 0, "meta": {
                    "title": page[:30] or None, "authors": ["A B", "C. D"],
                    "keywords": "k1, k2;k3"}}])
            rows.append(
                {
                    "conv_id": cid, "turn_idx": i, "role": "user",
                    "text": page, "tool": tool,
                    "ts": datetime.datetime(2024, 1, 1, 0, 0, i),
                }
            )
        per_conv[cid] = rows
        all_rows.extend(rows)

    from scientific_papers_ocr_spark import schemas

    df = spark.createDataFrame(all_rows, schema=schemas.TRANSCRIPTS)
    out = pipeline.run_pipeline(spark, df, output_dir=None, num_buckets=4)
    turns = {(r["conv_id"], r["turn_idx"]): r for r in out["turns"].collect()}
    docs = {r["conv_id"]: r for r in out["docs"].collect()}

    for cid, rows in per_conv.items():
        oracle = assembly.process_document([dict(r) for r in rows], conv_id=cid)
        for t in oracle["turns"]:
            got = turns[(cid, t["turn_idx"])]
            for col in ("page_text", "clean_text", "status"):
                assert got[col] == t[col], (cid, t["turn_idx"], col)
        assert docs[cid]["transcription"] == oracle["transcription"], cid
        # stdlib-json oracle vs fastjson production path, byte-for-byte
        assert docs[cid]["edoc_json"] == oracle["edoc_json"], cid

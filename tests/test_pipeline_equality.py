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

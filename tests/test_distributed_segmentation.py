"""Equality of the distributed (mega-conversation-safe) segmentation against
the whole-conversation path over the full fixture corpus: same section keys,
positions, titles, numbers, texts; same reference entries; same
abstract/references boundaries."""

import pytest
from pyspark.sql import functions as F

from scientific_papers_ocr_spark.operators import (
    documents as docops,
    segment_distributed as dist,
    turns as turnops,
)
from scientific_papers_ocr_spark.sources import transcripts as tsrc

N = 33
SEED = 42


@pytest.fixture(scope="module")
def turns_out(spark):
    df = tsrc.corpus_dataframe(spark, num_convs=N, seed=SEED)
    return turnops.extract_turns(df, num_buckets=8).cache()


@pytest.fixture(scope="module")
def whole_doc(turns_out):
    docs = docops.assemble_documents(turns_out)
    return {r["conv_id"]: r for r in docs.collect()}


@pytest.fixture(scope="module")
def distributed(turns_out):
    out = dist.segment_documents_distributed(turns_out)
    sections = {}
    for r in out["sections"].collect():
        sections.setdefault(r["conv_id"], {})[r["section_key"]] = r
    refs = {}
    for r in out["references"].collect():
        refs.setdefault(r["conv_id"], {})[r["ref_number"]] = r["raw"]
    bounds = {r["conv_id"]: r for r in out["boundaries"].collect()}
    return {"sections": sections, "references": refs, "boundaries": bounds}


def test_sections_match(whole_doc, distributed):
    checked = 0
    for cid, doc in whole_doc.items():
        want = {s["section_key"]: s for s in doc["sections"]}
        if len(want) == 1 and list(want.values())[0]["title"] == "Full Text":
            # degenerate fallback: the distributed section table must be
            # empty for these convs (the assembler adds the Full Text row)
            assert cid not in distributed["sections"], cid
            continue
        got = distributed["sections"].get(cid, {})
        assert set(got.keys()) == set(want.keys()), f"{cid}: keys {set(got)} != {set(want)}"
        for k, w in want.items():
            g = got[k]
            assert g["title"] == w["title"], (cid, k)
            assert g["number"] == w["number"], (cid, k)
            assert g["text"] == w["text"], (cid, k, g["text"][:80], w["text"][:80])
            assert g["start_turn"] == w["start"]["turn_idx"], (cid, k)
            assert g["start_pos"] == w["start"]["pos"], (cid, k)
            assert g["end_turn"] == w["end"]["turn_idx"], (cid, k)
            assert g["end_pos"] == w["end"]["pos"], (cid, k)
            checked += 1
    assert checked > 50


def test_references_match(whole_doc, distributed):
    checked = 0
    for cid, doc in whole_doc.items():
        want = {r["ref_number"]: r["raw"] for r in doc["references"]}
        got = distributed["references"].get(cid, {})
        assert got == want, cid
        checked += 1 if want else 0
    assert checked > 10


def test_abstract_boundaries_match(whole_doc, distributed):
    checked = 0
    for cid, doc in whole_doc.items():
        b = distributed["boundaries"].get(cid)
        if doc["abstract_text"] is None:
            assert b is None or b["abs_turn"] is None, cid
        else:
            assert b is not None and b["abs_text"] == doc["abstract_text"], cid
            checked += 1
    assert checked > 10


def test_assemble_documents_distributed_full_parity(turns_out, whole_doc):
    got = {
        r["conv_id"]: r
        for r in dist.assemble_documents_distributed(turns_out).collect()
    }
    assert set(got) == set(whole_doc)
    for cid, w in whole_doc.items():
        g = got[cid]
        assert g["transcription"] == w["transcription"], cid
        assert g["edoc_json"] == w["edoc_json"], cid
        assert g["title"] == w["title"], cid
        assert g["abstract_text"] == w["abstract_text"], cid
        assert g["n_sections"] == w["n_sections"], cid
        assert g["n_refs"] == w["n_refs"], cid
        assert g["n_turns"] == w["n_turns"], cid
        assert g["bucket"] == w["bucket"], cid
        assert sorted(s["section_key"] for s in g["sections"]) == sorted(
            s["section_key"] for s in w["sections"]
        ), cid


def test_no_whole_conversation_shuffle(spark, turns_out):
    """The section-text range join must shuffle section spans + page rows,
    never a collected whole conversation: assert the plan contains no
    per-conv applyInPandas over the full page set (FlatMapGroupsInPandas on
    page_text only appears in the tiny boundary-finishing step)."""
    out = dist.segment_documents_distributed(turns_out)
    plan = out["sections"]._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan  # ordered concat of section pieces only


def test_chunk_boundary_crossing_parity(spark):
    """The binned range join (chunk = 1024 turns) must stay byte-identical
    to the whole-conv assembler when section spans CROSS chunk boundaries —
    a 2600-turn conversation spans chunks 0..2 and its trailing section
    covers pages in more than one chunk (the explode path the 800-turn
    fixtures never exercise)."""
    df = tsrc.corpus_dataframe(spark, num_convs=1, seed=41, turns_per_conv=2600)
    t = turnops.extract_turns(df, num_buckets=8).cache()
    try:
        whole = {r["conv_id"]: r for r in docops.assemble_documents(t).collect()}
        got = {
            r["conv_id"]: r
            for r in dist.assemble_documents_distributed(t).collect()
        }
        assert set(got) == set(whole)
        for cid in whole:
            w, g = whole[cid].asDict(), got[cid].asDict()
            for col in w:
                assert g[col] == w[col], (cid, col)
        assert next(iter(whole.values()))["n_turns"] == 2600
    finally:
        t.unpersist()


def test_references_entries_randomized_parity_with_oracle(spark):
    """The entry-bounded references parser must reproduce the oracle's
    ``parse_reference_entries(" ".join(pieces))`` on adversarial page splits:
    markers split across the join seam (must NOT match), terminators at page
    edges ("\\n" + "\\n" across the seam must NOT terminate), overlapping
    terminators ("\\n\\n\\n"), duplicate numbers (last wins), markers with no
    terminator after them (entry dropped), empty pages, and bodies spanning
    many pages."""
    import random

    from scientific_papers_ocr_spark.oracle import segmentation as oracle_seg

    rng = random.Random(20260817)
    atoms = [
        "\n", "\n\n", "*", "[", "]", "[1]", "[2]", "[12]", "[345]",
        "a", "bb ", " ", "x[3]y", "\n*", "\n\n[4]", "tail", "", "7",
        "[", "8]", "\n", "[9] body\n\n",
    ]
    convs = []
    for c in range(200):
        n_pages = rng.randint(1, 8)
        pages = [
            "".join(rng.choice(atoms) for _ in range(rng.randint(0, 30)))
            for _ in range(n_pages)
        ]
        # half the conversations also randomize the boundary, exercising the
        # first-piece ref_start slice and the offset math downstream of it
        if c % 2:
            ref_turn = rng.randrange(n_pages)
            ref_start = rng.randint(0, len(pages[ref_turn])) if pages[ref_turn] else 0
        else:
            ref_turn, ref_start = 0, 0
        convs.append((f"rc-{c:03d}", pages, ref_turn, ref_start))

    rows = [
        {"conv_id": cid, "turn_idx": i, "page_text": p}
        for cid, pages, _, _ in convs
        for i, p in enumerate(pages)
    ]
    turns_df = spark.createDataFrame(
        rows, schema="conv_id string, turn_idx int, page_text string"
    )
    bounds_df = spark.createDataFrame(
        [
            {"conv_id": cid, "ref_turn": rt, "ref_start": rs}
            for cid, _, rt, rs in convs
        ],
        schema="conv_id string, ref_turn int, ref_start int",
    )

    got_rows: dict[str, list] = {}
    for r in dist.references_entries(bounds_df, turns_df).collect():
        got_rows.setdefault(r["conv_id"], []).append(
            (r["ref_rank"], r["ref_number"], r["raw"])
        )

    for cid, pages, rt, rs in convs:
        tail = [pages[rt][rs:]] + list(pages[rt + 1:])
        want = oracle_seg.parse_reference_entries(" ".join(tail))
        got = [(n, raw) for _, n, raw in sorted(got_rows.get(cid, []))]
        # ORDERED comparison: the oracle dict's first-insertion order is part
        # of the contract (transcription/edoc rendering iterate it)
        assert got == list(want.items()), (cid, pages, rt, rs)


def test_fuzzed_pages_whole_vs_distributed_parity(spark):
    """Junk-page fuzz through BOTH assemblers: whole-conv vs distributed must
    agree column-for-column on arbitrary character soup.  This is the test
    that caught the references-ordering defect: the oracle's entries dict
    preserves scan (first-insertion) order and rendering iterates it, so a
    numerically-sorted distributed path diverges whenever entries appear out
    of order in the text — which crafted fixtures never do."""
    import datetime
    import random

    alph = list("abc ABC\n#*_`$[](){}.,;:!?\"'\\/-=+0123456789") + [
        "é", "中", "\U0001f389", "א", "́", "ﬁ",
        "\n\n", "## ", "[1] ", "[2] ", "Abstract", "References", "$$", "\n* ",
    ]
    all_rows = []
    for seed in range(20):
        rng = random.Random(1000 + seed)
        cid = f"dfuzz-{seed:02d}"
        for i in range(rng.randint(1, 8)):
            page = "".join(rng.choice(alph) for _ in range(rng.randint(0, 500)))
            all_rows.append(
                {
                    "conv_id": cid, "turn_idx": i, "role": "user",
                    "text": page, "tool": "",
                    "ts": datetime.datetime(2024, 1, 1, 0, 0, i),
                }
            )

    from scientific_papers_ocr_spark import schemas

    df = spark.createDataFrame(all_rows, schema=schemas.TRANSCRIPTS)
    t = turnops.extract_turns(df, num_buckets=4).cache()
    try:
        whole = {r["conv_id"]: r for r in docops.assemble_documents(t).collect()}
        got = {
            r["conv_id"]: r
            for r in dist.assemble_documents_distributed(t).collect()
        }
        assert set(got) == set(whole)
        for cid in whole:
            w, g = whole[cid].asDict(), got[cid].asDict()
            for col in w:
                assert g[col] == w[col], (cid, col)
    finally:
        t.unpersist()
        dist.release_planning_caches()


def test_release_planning_caches_unpersists(spark):
    """Every segment_documents_distributed call persists three planning
    frames; release_planning_caches must unpersist ALL of them (across
    multiple invocations) so long-lived sessions don't accumulate cached
    partitions in executor memory."""
    df = tsrc.corpus_dataframe(spark, num_convs=2, seed=7)
    t = turnops.extract_turns(df, num_buckets=4)
    before = len(dist._registered_planning_caches())
    out1 = dist.segment_documents_distributed(t)
    out2 = dist.segment_documents_distributed(t)
    out1["sections"].count()
    out2["sections"].count()
    registered = dist._registered_planning_caches()[before:]
    assert len(registered) == 6
    assert all(f.storageLevel.useMemory for f in registered)
    dist.release_planning_caches()
    assert dist._registered_planning_caches() == []
    assert not any(f.storageLevel.useMemory for f in registered)
    # released frames still compute correctly (cache miss -> recompute)
    assert out1["boundaries"].count() == out2["boundaries"].count()


def test_release_planning_caches_is_scoped_per_thread(spark):
    """The cache registry is thread-local: one pipeline's release must not
    unpersist another concurrent pipeline's in-flight planning frames (that
    would silently degrade the other run to full recomputation mid-job).

    The two pipelines must run over DIFFERENT inputs, as concurrent real
    runs do: Spark's CacheManager keys cached data by logical plan, so two
    persists of the SAME plan share one cache entry that either handle's
    unpersist removes — no registry scoping can (or should) isolate that."""
    import threading

    df = tsrc.corpus_dataframe(spark, num_convs=2, seed=7)
    t = turnops.extract_turns(df, num_buckets=4)
    df_other = tsrc.corpus_dataframe(spark, num_convs=3, seed=11)
    t_other = turnops.extract_turns(df_other, num_buckets=4)
    other: dict = {}

    def other_pipeline():
        out = dist.segment_documents_distributed(t_other)
        out["sections"].count()
        other["frames"] = list(dist._registered_planning_caches())

    th = threading.Thread(target=other_pipeline)
    th.start()
    th.join()
    assert len(other["frames"]) == 3
    assert all(f.storageLevel.useMemory for f in other["frames"])

    # this thread releases ITS registrations — the other thread's caches
    # must stay persisted
    out_here = dist.segment_documents_distributed(t)
    out_here["sections"].count()
    dist.release_planning_caches()
    assert dist._registered_planning_caches() == []
    assert all(f.storageLevel.useMemory for f in other["frames"])
    for f in other["frames"]:
        f.unpersist(blocking=False)

"""Per-turn narrow stages: tokenize, verify, repair (SURVEY.md §7 stages 1-3).

All three stages are embarrassingly parallel per row, so they run as ONE
fused ``mapInPandas`` pass — no shuffle, Arrow-batched, whole pipeline stays
inside a single Spark stage regardless of data size.  Skewed
mega-conversations cost nothing here because nothing groups by ``conv_id``
yet.

The Python functions invoked per row are the oracle package itself — the
distributed output is byte-identical to the single-node oracle by
construction; pytest verifies the plumbing (ordering, grouping, repair
routing).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .. import schemas
from ..oracle import assembly, layout, markup


def _process_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out: dict[str, list] = {
        "conv_id": [], "turn_idx": [], "page_text": [], "clean_text": [],
        "status": [], "n_blocks": [], "n_incomplete_blocks": [],
        "min_score": [], "blocks": [], "meta_json": [],
    }
    for conv_id, turn_idx, text, tool in zip(
        pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
    ):
        text = text or ""
        tool = tool or ""
        verdict = assembly.score_turn(text, tool)
        page_text = text
        if verdict["status"] == "incomplete":
            parts = assembly.repair_turn(text, tool)
            if parts is not None:
                page_text = assembly.flatten_parts(parts)
        blocks = markup.split_markdown_into_blocks(page_text)
        clean = markup.clean_turn_text(page_text)
        scores = verdict["scores"]
        meta = assembly.extract_turn_meta(tool) if turn_idx == 0 else None
        out["conv_id"].append(conv_id)
        out["turn_idx"].append(turn_idx)
        out["page_text"].append(page_text)
        out["clean_text"].append(clean)
        out["status"].append(verdict["status"])
        out["n_blocks"].append(len(blocks))
        out["n_incomplete_blocks"].append(len(verdict["incomplete_blocks"]))
        out["min_score"].append(min(scores.values()) if scores else None)
        out["blocks"].append(
            [{"block_type": b["type"], "content": b["content"]} for b in blocks]
        )
        out["meta_json"].append(json.dumps(meta) if meta is not None else None)
    return pd.DataFrame(out)


def extract_turns(transcripts: DataFrame, num_buckets: int = 64) -> DataFrame:
    """Transcripts → per-turn extraction records (narrow; zero shuffles).

    ``bucket`` — the lineage/commit partition key — is computed JVM-side as
    ``crc32(conv_id) % num_buckets`` so both engines (and the resume
    anti-join) agree on it without Python round-trips.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _process_batch(pdf)

    cols = ["conv_id", "turn_idx", "text", "tool"]
    result = transcripts.select(*cols).mapInPandas(process, schema=schemas.TURNS_CORE)
    return result.withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("conv_id")), F.lit(num_buckets)).cast("int"),
    )


def repair_parts(transcripts: DataFrame) -> DataFrame:
    """Explicit (conv, turn, part) repair-part table for incomplete turns —
    the analog of the reference's ``page_N/part_M.mmd`` hierarchy
    (check_transcription.py:170-187).  Narrow: parts derive from the same
    row's layout payload; the explode is local.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"conv_id": [], "turn_idx": [], "part_idx": [], "text": []}
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                verdict = assembly.score_turn(text or "", tool or "")
                if verdict["status"] != "incomplete":
                    continue
                parts = assembly.repair_turn(text or "", tool or "")
                if parts is None:
                    continue
                for p_idx, p_text in enumerate(parts):
                    rows["conv_id"].append(conv_id)
                    rows["turn_idx"].append(turn_idx)
                    rows["part_idx"].append(p_idx)
                    rows["text"].append(p_text)
            yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx", "text", "tool").mapInPandas(
        process, schema=schemas.PARTS_OUT
    )


def flatten_parts_df(parts: DataFrame) -> DataFrame:
    """S8 part-flatten as a pure DataFrame aggregation: part texts joined
    with a single space in part order, deterministically via
    ``sort_array(collect_list(struct(...)))`` (never shuffle order).

    Reference: check_transcription.py:51-83.
    """
    return parts.groupBy("conv_id", "turn_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("part_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text")
    )


def explode_layout_blocks(transcripts: DataFrame) -> DataFrame:
    """Layout side channel → one row per (turn, block): the exploded
    tesseract-analog table used by the relational verification slice
    (bbox aggregation, block classification as column expressions).
    """
    block_schema = (
        "array<struct<level:int,block_num:int,x:int,y:int,w:int,h:int,text:string>>"
    )
    exploded = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.explode(F.from_json(F.col("tool"), block_schema)).alias("b"),
        )
        .select("conv_id", "turn_idx", "b.*")
        .where(F.col("level").isNotNull())
    )
    return exploded

"""Determinism + resume tests (SURVEY.md §5.2 items 5-6).

- Output must be identical under different shuffle-partition counts and a
  shuffled input row order (guards the sort_array∘collect_list discipline —
  Spark gives no intra-group order guarantees).
- A restart after a partial commit must skip committed buckets and converge
  to the clean-run output.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from scientific_papers_ocr_spark import pipeline
from scientific_papers_ocr_spark.sources import transcripts as tsrc

N = 18
SEED = 77


def _docs_fingerprint(docs_df):
    return sorted(
        (r["conv_id"], r["transcription"], r["edoc_json"])
        for r in docs_df.collect()
    )


def _turns_fingerprint(turns_df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["page_text"], r["clean_text"], r["status"])
        for r in turns_df.collect()
    )


@pytest.fixture(scope="module")
def base_df(spark):
    return tsrc.corpus_dataframe(spark, num_convs=N, seed=SEED)


def test_shuffle_partition_invariance(spark, base_df):
    ref = None
    for parts in ("3", "17"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        out = pipeline.run_pipeline(spark, base_df, output_dir=None, num_buckets=8)
        fp = (_turns_fingerprint(out["turns"]), _docs_fingerprint(out["docs"]))
        if ref is None:
            ref = fp
        else:
            assert fp == ref, f"output differs at shuffle.partitions={parts}"
    spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_input_order_invariance(spark, base_df):
    clean = pipeline.run_pipeline(spark, base_df, output_dir=None, num_buckets=8)
    shuffled = base_df.orderBy(F.rand(seed=5))
    redo = pipeline.run_pipeline(spark, shuffled, output_dir=None, num_buckets=8)
    assert _docs_fingerprint(clean["docs"]) == _docs_fingerprint(redo["docs"])
    assert _turns_fingerprint(clean["turns"]) == _turns_fingerprint(redo["turns"])


def test_resume_skips_committed_buckets(spark, base_df, tmp_path):
    out_dir = str(tmp_path / "out")

    # clean full run
    clean = pipeline.run_pipeline(spark, base_df, output_dir=out_dir, num_buckets=8)
    clean_docs = _docs_fingerprint(clean["docs"])
    clean_turns = _turns_fingerprint(clean["turns"])
    lineage = spark.read.parquet(os.path.join(out_dir, "lineage"))
    buckets = sorted(r["bucket"] for r in lineage.select("bucket").distinct().collect())
    assert len(buckets) >= 2

    # simulate a crash that lost one bucket's commit: drop its lineage rows
    victim = buckets[0]
    kept = lineage.where(F.col("bucket") != victim)
    tmp_lineage = os.path.join(out_dir, "lineage_tmp")
    kept.write.mode("overwrite").parquet(tmp_lineage)
    shutil.rmtree(os.path.join(out_dir, "lineage"))
    os.replace(tmp_lineage, os.path.join(out_dir, "lineage"))

    # resume: must only process the victim bucket, then match the clean run
    resumed = pipeline.run_pipeline(
        spark, base_df, output_dir=out_dir, num_buckets=8, resume=True
    )
    assert _docs_fingerprint(resumed["docs"]) == clean_docs
    assert _turns_fingerprint(resumed["turns"]) == clean_turns
    lineage2 = spark.read.parquet(os.path.join(out_dir, "lineage"))
    assert sorted(
        r["bucket"] for r in lineage2.select("bucket").distinct().collect()
    ) == buckets
    # exactly ONE new lineage row (the victim) — committed buckets must not
    # be recomputed or re-appended on resume
    assert lineage2.count() == len(buckets)

    # resume with everything committed: input reduces to zero rows
    done = pipeline.committed_buckets(spark, os.path.join(out_dir, "lineage"))
    remaining = pipeline.add_bucket(base_df, 8).join(
        F.broadcast(done), on="bucket", how="left_anti"
    )
    assert remaining.count() == 0


def test_lineage_counters_match_turns(spark, base_df, tmp_path):
    out_dir = str(tmp_path / "out2")
    out = pipeline.run_pipeline(spark, base_df, output_dir=out_dir, num_buckets=8)
    lineage = out["lineage"]
    totals = lineage.agg(
        F.sum("n_turns").alias("turns"), F.sum("n_convs").alias("convs")
    ).collect()[0]
    assert totals["turns"] == out["turns"].count()
    assert totals["convs"] == out["docs"].count()
    by_status = {
        r["status"]: r["n"]
        for r in out["turns"].groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sums = lineage.agg(
        F.sum("n_complete").alias("c"),
        F.sum("n_incomplete").alias("i"),
        F.sum("n_missing").alias("m"),
        F.sum("n_unverified").alias("u"),
    ).collect()[0]
    assert sums["c"] == by_status.get("complete", 0)
    assert sums["i"] == by_status.get("incomplete", 0)
    assert sums["m"] == sum(v for k, v in by_status.items() if k.startswith("missing"))
    assert sums["u"] == by_status.get("unverified", 0)

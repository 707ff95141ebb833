"""Skew handling: a zipf-skewed corpus plus one forced mega-conversation must
produce oracle-exact output through BOTH assembly paths (whole-conversation
and distributed), and the narrow stage must stay shuffle-free regardless of
skew."""

import pytest
from pyspark.sql import functions as F

from scientific_papers_ocr_spark import fixtures
from scientific_papers_ocr_spark.operators import (
    documents as docops,
    segment_distributed as dist,
    turns as turnops,
)
from scientific_papers_ocr_spark.oracle import assembly


@pytest.fixture(scope="module")
def skewed_df(spark):
    zipf = fixtures.spark_corpus(spark, 40, seed=42, zipf_max_turns=120)
    mega = fixtures.spark_corpus(spark, 1, seed=99, turns_per_conv=800)
    return zipf.unionByName(mega).cache()


def test_zipf_distribution_is_skewed(skewed_df):
    sizes = (
        skewed_df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sorted(r["n"] for r in sizes)
    assert n[-1] == 800              # the mega conv
    assert n[0] <= 4                 # plenty of tiny convs
    assert len(n) == 41


def test_mega_conv_matches_oracle(spark, skewed_df):
    turns_out = turnops.extract_turns(skewed_df, num_buckets=8)
    docs = docops.assemble_documents(turns_out)
    mega_id = "conv-99-00000-full_paper"
    got = docs.where(F.col("conv_id") == mega_id).first()
    assert got is not None and got["n_turns"] == 800

    rows = [r.asDict() for r in skewed_df.where(F.col("conv_id") == mega_id).collect()]
    oracle = assembly.process_document(rows, conv_id=mega_id)
    assert got["transcription"] == oracle["transcription"]


def test_distributed_matches_whole_doc_on_skew(spark, skewed_df):
    turns_out = turnops.extract_turns(skewed_df, num_buckets=8).cache()
    whole = {
        r["conv_id"]: r["transcription"]
        for r in docops.assemble_documents(turns_out).collect()
    }
    distd = {
        r["conv_id"]: r["transcription"]
        for r in dist.assemble_documents_distributed(turns_out).collect()
    }
    assert whole == distd


def test_pipeline_routes_mega_convs_to_distributed_assembler(spark, skewed_df):
    """run_pipeline with a low skew threshold must send the 800-turn conv
    through the distributed assembler and everything else through the batched
    path — with output identical to the unrouted pipeline."""
    from scientific_papers_ocr_spark import pipeline

    routed = pipeline.run_pipeline(
        spark, skewed_df, output_dir=None, num_buckets=8, skew_turn_threshold=500
    )["docs"]
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # the distributed assembler's boundary election runs window functions;
    # the batched fast path has none
    assert "Window" in plan, "routing should engage the distributed assembler"

    unrouted = pipeline.run_pipeline(
        spark, skewed_df, output_dir=None, num_buckets=8, skew_turn_threshold=None
    )["docs"]
    got = {r["conv_id"]: r["transcription"] for r in routed.collect()}
    want = {r["conv_id"]: r["transcription"] for r in unrouted.collect()}
    assert got == want
    assert "conv-99-00000-full_paper" in got


def test_pipeline_stays_fast_path_without_skew(spark, skewed_df):
    """with no conv over the threshold the routed pipeline must compile to the
    plain single-assembler plan (no Union, no distributed DAG)."""
    from scientific_papers_ocr_spark import pipeline

    docs = pipeline.run_pipeline(
        spark, skewed_df, output_dir=None, num_buckets=8, skew_turn_threshold=10_000
    )["docs"]
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_narrow_stage_shuffle_free_under_skew(skewed_df):
    # the corpus generator itself repartitions (visible under the cache);
    # extract_turns must add ZERO exchanges on top of its input
    def exchanges_above_cache(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.split("InMemoryTableScan")[0].count("Exchange")

    assert exchanges_above_cache(skewed_df) == 0
    assert exchanges_above_cache(turnops.extract_turns(skewed_df, num_buckets=8)) == 0

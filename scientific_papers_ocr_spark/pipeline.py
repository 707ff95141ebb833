"""End-to-end extraction job with per-partition lineage and resume.

Topology (one job, one shuffle):

    read transcripts
      → [narrow] fused per-turn tokenize/verify/repair  (mapInPandas)
      → write turns table (partitioned by bucket)
      → [wide]  exchange on conv_id → per-conv assembly (applyInPandas)
      → write docs + spans tables (partitioned by bucket)
      → write lineage rows (counts + checksum per bucket)

Resume protocol (north rule): the driver reads committed lineage buckets and
anti-joins them out of the input BEFORE the narrow stage, so a restart only
processes uncommitted partitions; partition-overwrite writes make re-commits
idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas
from .operators import documents, turns
from .sources import transcripts as tsrc


def add_bucket(df: DataFrame, num_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.crc32(F.col("conv_id")), F.lit(num_buckets)).cast("int")
    )


def lineage_rows(turns_out: DataFrame) -> DataFrame:
    """Per-bucket counters + an order-insensitive content checksum
    (SURVEY.md §2.4 A10; north rule lineage + metrics)."""
    return turns_out.groupBy("bucket").agg(
        F.countDistinct("conv_id").alias("n_convs"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("status") == "complete", 1).otherwise(0)).alias("n_complete"),
        F.sum(F.when(F.col("status") == "incomplete", 1).otherwise(0)).alias("n_incomplete"),
        F.sum(F.when(F.col("status").startswith("missing"), 1).otherwise(0)).alias("n_missing"),
        F.sum(F.when(F.col("status") == "unverified", 1).otherwise(0)).alias("n_unverified"),
        F.sum(F.crc32(F.concat_ws("\x00", "conv_id", "turn_idx", "page_text"))).alias("checksum"),
        F.current_timestamp().alias("committed_at"),
    )


def committed_buckets(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    """Buckets already committed by a previous run; None when no lineage."""
    if not os.path.exists(lineage_path):
        return None
    try:
        return spark.read.parquet(lineage_path).select("bucket").distinct()
    except Exception:
        return None


def run_pipeline(
    spark: SparkSession,
    transcripts_df: DataFrame,
    output_dir: str | None = None,
    num_buckets: int = 64,
    resume: bool = False,
) -> dict[str, DataFrame]:
    """Run the full pipeline; when ``output_dir`` is set, materialise the
    turns/docs/spans/lineage tables there (partitioned by bucket) and, with
    ``resume=True``, skip buckets whose lineage rows are already committed.
    """
    df = add_bucket(transcripts_df, num_buckets)

    done = None
    if resume and output_dir:
        done = committed_buckets(spark, os.path.join(output_dir, "lineage"))
        if done is not None:
            # anti-join on the small committed-bucket set: broadcast it
            df = df.join(F.broadcast(done), on="bucket", how="left_anti")

    turns_out = turns.extract_turns(df.drop("bucket"), num_buckets=num_buckets)

    if not output_dir:
        docs_out = documents.assemble_documents(turns_out)
        return {
            "turns": turns_out,
            "docs": docs_out,
            "spans": documents.explode_spans(docs_out),
            "lineage": lineage_rows(turns_out),
        }

    # materialise the narrow stage once; downstream stages read the committed
    # columnar table (column-pruned scan) instead of recomputing the
    # pandas-UDF pass per action.  On resume, dynamic partition overwrite
    # touches only the freshly processed buckets.
    tsrc.write_partitioned(turns_out, os.path.join(output_dir, "turns"))
    all_turns = spark.read.parquet(os.path.join(output_dir, "turns"))
    fresh_turns = (
        all_turns.join(F.broadcast(done), on="bucket", how="left_anti")
        if done is not None
        else all_turns
    )

    # assemble/lineage ONLY the buckets processed in this run — committed
    # buckets keep their existing docs/spans partitions and lineage rows
    docs_out = documents.assemble_documents(fresh_turns)
    tsrc.write_partitioned(docs_out, os.path.join(output_dir, "docs"))
    fresh_docs = (
        spark.read.parquet(os.path.join(output_dir, "docs")).join(
            F.broadcast(done), on="bucket", how="left_anti"
        )
        if done is not None
        else spark.read.parquet(os.path.join(output_dir, "docs"))
    )
    tsrc.write_partitioned(
        documents.explode_spans(fresh_docs), os.path.join(output_dir, "spans")
    )
    lineage_path = os.path.join(output_dir, "lineage")
    mode = "append" if (resume and os.path.exists(lineage_path)) else "overwrite"
    lineage_rows(fresh_turns).write.mode(mode).parquet(lineage_path)
    return {
        name: spark.read.parquet(os.path.join(output_dir, name))
        for name in ("turns", "docs", "spans", "lineage")
    }

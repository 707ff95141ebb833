"""Streaming drop-in for the extraction pipeline.

The reference is pure batch (SURVEY.md §2.10), and the north rule only
requires batch-over-Iceberg — but the per-turn stages are stateless maps, so
the same operators run unchanged under Structured Streaming.  This module
wires that up:

- ``stream_transcripts``: ``readStream`` over the transcripts table location
  (file source stands in for an Iceberg/Kafka source).
- ``stream_extract_turns``: the IDENTICAL narrow stage (``extract_turns`` is
  stateless mapInPandas, legal on streaming frames).
- ``stream_turn_counts``: watermarked per-conversation windowed counters —
  the metrics-layer example of event-time aggregation with late data.

Per-conversation ASSEMBLY is deliberately batch-only: the reference's
segmentation semantics need the whole document, i.e. a session window closed
by data completeness, not time.  The streaming shape for it would be
``applyInPandasWithState`` keyed by conv_id buffering turns until an
end-of-conversation marker; we document rather than fake it — the batch wide
stage over committed micro-batch output is the production pattern
(stream-ingest, batch-assemble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..operators import turns


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def stream_extract_turns(stream_df: DataFrame, num_buckets: int = 64) -> DataFrame:
    """The batch narrow stage applied to a streaming frame — same code path,
    same output schema; stateless, so no watermark needed."""
    return turns.extract_turns(stream_df, num_buckets=num_buckets)


def stream_turn_counts(stream_df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Watermarked event-time windowed per-kind counters (late data up to
    30 minutes) — the streaming twin of the lineage counters.  Kind detection
    stays JVM-side (sentinel regex is dialect-safe), so the aggregation is a
    plain watermarked streaming agg with no Python in the loop."""
    kind = (
        F.when(
            F.col("text").rlike(r"^\s*\[MISSING_PAGE_(EMPTY|FAIL):\d+\]\s*$"),
            F.lit("missing"),
        )
        .when(F.length(F.trim(F.col("text"))) == 0, F.lit("empty"))
        .otherwise(F.lit("content"))
    )
    return (
        stream_df.withColumn("kind", kind)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", window), F.col("kind"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def run_stream_to_parquet(
    spark: SparkSession,
    source_path: str,
    output_path: str,
    checkpoint_path: str,
    num_buckets: int = 64,
):
    """End-to-end streaming job: transcripts files → narrow extraction →
    bucket-partitioned parquet sink with checkpointing (exactly-once file
    sink; restart resumes from the checkpoint offset, the streaming analog of
    the batch lineage/anti-join resume)."""
    stream = stream_transcripts(spark, source_path)
    out = stream_extract_turns(stream, num_buckets=num_buckets)
    return (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("bucket")
        .trigger(availableNow=True)
        .start()
    )

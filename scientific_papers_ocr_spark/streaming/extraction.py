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

Stateful operators:
- ``stream_sessionize``: built-in ``session_window`` gap sessionization with
  a watermark — the streaming twin of the batch ``sessionize`` query.
- ``stream_assemble_conversations``: ``applyInPandasWithState`` keyed by
  conv_id buffering raw turns until the conversation is complete (its
  ``n_total`` turn count arrives — a data-completeness close, which is what
  the reference's whole-document segmentation semantics require) or a
  processing-time timeout flushes a partial document.  The closed buffer runs
  the SAME single-node oracle (``assembly.process_document``) as the batch
  wide stage, so streaming output equals batch output per conversation.
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


def stream_sessionize(stream_df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization on a stream: watermarked ``session_window``
    aggregation (state compaction handled by Spark's streaming session
    operator) — the streaming twin of the batch lag+cumsum ``sessionize``
    query, with identical gap semantics."""
    return (
        stream_df.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("session"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_turns",
            "session_start",
            "session_end",
        )
    )


ASSEMBLED_DOC = (
    "conv_id string, n_turns int, complete boolean, title string, "
    "n_sections int, n_refs int, transcription string"
)
_ASSEMBLY_STATE = "turn_idx array<int>, text array<string>, tool array<string>, n_total int"


def stream_assemble_conversations(
    stream_df: DataFrame, timeout_ms: int = 600_000
) -> DataFrame:
    """Custom stateful operator: per-conversation document assembly on a
    stream via ``applyInPandasWithState``.

    Rows must carry ``n_total`` (the conversation's total turn count — the
    end-of-conversation signal; an explicit end-marker row works the same
    way).  Turns buffer in group state; when the buffer reaches ``n_total``
    the conversation closes and the single-node oracle assembles it
    (byte-identical to the batch wide stage).  A processing-time timeout
    flushes stragglers as ``complete = false`` partial documents, bounding
    state size — late turns for a flushed conversation start a new partial.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..oracle import assembly

    def assemble(key, pdf_iter, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            (turn_idx, text, tool, n_total) = state.get
            state.remove()
            yield _finish(conv_id, turn_idx, text, tool, complete=False)
            return
        turn_idx: list[int] = []
        text: list[str] = []
        tool: list[str] = []
        n_total = None
        if state.exists:
            turn_idx, text, tool, n_total = state.get
            turn_idx, text, tool = list(turn_idx), list(text), list(tool)
        for pdf in pdf_iter:
            turn_idx.extend(int(i) for i in pdf["turn_idx"])
            text.extend(t if t is not None else "" for t in pdf["text"])
            tool.extend(t if t is not None else "" for t in pdf["tool"])
            if "n_total" in pdf.columns and len(pdf):
                # first NON-NULL n_total in the chunk: with the explicit
                # end-marker-row design most rows carry a null here, and the
                # marker is not guaranteed to be row 0 of the chunk
                marked = pdf["n_total"].dropna()
                if len(marked):
                    n_total = int(marked.iloc[0])
        # count DISTINCT turn indices: at-least-once delivery can replay a
        # turn, and a duplicate must not close the conversation early
        if n_total is not None and len(set(turn_idx)) >= n_total:
            state.remove()
            yield _finish(conv_id, turn_idx, text, tool, complete=True)
        else:
            state.update((turn_idx, text, tool, n_total))
            state.setTimeoutDuration(timeout_ms)

    def _finish(conv_id, turn_idx, text, tool, complete):
        # drop redelivered duplicates (keep the first delivery per turn_idx)
        # so replayed turns change neither the assembled bytes nor n_turns
        seen: set[int] = set()
        rows = []
        for i, t, o in zip(turn_idx, text, tool):
            if i in seen:
                continue
            seen.add(i)
            rows.append({"turn_idx": i, "text": t, "tool": o})
        doc = assembly.process_document(rows, conv_id=conv_id)
        seg = doc["segmentation"]
        return pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": len(rows),
                    "complete": complete,
                    "title": (doc["meta"] or {}).get("title"),
                    "n_sections": len(seg["sections"]),
                    "n_refs": len(seg["references"]["entries"]) if seg["references"] else 0,
                    "transcription": doc["transcription"],
                }
            ]
        )

    return stream_df.groupBy("conv_id").applyInPandasWithState(
        assemble,
        outputStructType=ASSEMBLED_DOC,
        stateStructType=_ASSEMBLY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_to_rate_limited_sink(
    stream_df: DataFrame,
    transport,
    checkpoint_path: str,
    rate_per_sec: float = 3.0,
    batch_size: int = 10,
):
    """Streaming twin of the S13 rate-limited sink: each micro-batch drains
    through ``sinks.write_rate_limited`` (foreachPartition + token bucket),
    so an external API sees bounded request rates regardless of micro-batch
    size; checkpointing gives at-least-once delivery (the reference's Notion
    uploads are idempotent per page id — dedupe belongs in the transport)."""
    from .. import sinks

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        sinks.write_rate_limited(
            batch_df, transport, rate_per_sec=rate_per_sec, batch_size=batch_size
        )

    return (
        stream_df.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
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

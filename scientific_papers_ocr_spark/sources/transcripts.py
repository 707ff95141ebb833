"""Transcript table reader/writers.

In production these are Iceberg tables (``spark.read.table`` /
``df.writeTo(...).overwritePartitions()``); in the sandbox we use parquet
directories partitioned by ``bucket``, which preserves the two properties the
north rule needs: partition pruning on the commit key and idempotent
partition overwrite (``partitionOverwriteMode=dynamic``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures, schemas


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(schemas.TRANSCRIPTS).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_col: str = "bucket", clustered: bool = False
) -> None:
    """Idempotent partition-overwrite write (Iceberg ``overwritePartitions``
    analog).

    ``clustered=False`` (arbitrary-partitioned frames): the frame is
    hash-clustered on the partition key first — without it every task writes
    a file into every partition directory (tasks x buckets small files —
    measured 40%+ of job wall time); with it each bucket gets one writer.
    Iceberg's write.distribution-mode=hash does the same thing.

    ``clustered=True`` (frames already clustered on the key — the assembly
    stage's output, whose exchange key IS the bucket, or a scan of a
    bucket-partitioned table): write directly, no exchange.  Each task then
    holds rows of only a few distinct buckets, so the file count stays
    O(buckets), and the pre-write repartition — measured as the pipeline's
    dominant FIXED cost on the scaling pair (+6.2s at local[2] vs +2.3s at
    local[8] over a flat write of the same bytes) — disappears.  Iceberg's
    write.distribution-mode=none under a bucket-aligned plan.
    """
    src = df if clustered else df.repartition(F.col(partition_col))
    (
        src.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def ensure_fixture_corpus(path: str, **kwargs) -> str:
    """Materialise the seeded synthetic corpus at ``path`` once (driver-side
    pyarrow write; deterministic for a given kwargs set)."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fixtures.corpus_to_parquet(path, **kwargs)
    return path


def corpus_dataframe(spark: SparkSession, **kwargs) -> DataFrame:
    """Small corpora straight into a DataFrame (tests)."""
    rows = fixtures.generate_corpus(**kwargs)
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)

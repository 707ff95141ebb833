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


def write_partitioned(df: DataFrame, path: str, partition_col: str = "bucket") -> None:
    """Idempotent partition-overwrite write (Iceberg ``overwritePartitions``
    analog).

    The frame is clustered on the partition key first: without it every task
    writes a file into every partition directory (tasks x buckets small
    files — measured 40%+ of job wall time); with it each bucket gets one
    writer.  Iceberg's write.distribution-mode=hash does the same thing.
    """
    (
        df.repartition(F.col(partition_col))
        .write.mode("overwrite")
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

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data operators: dedup, similarity, text
analysis) with exact DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scientific_papers_ocr_spark import queries as Q  # noqa: E402
from scientific_papers_ocr_spark.session import package_zip  # noqa: E402


def _ensure_pkg_on_workers(spark: SparkSession) -> None:
    """The driver may hand us a bare session; ship the package zip so
    pandas-UDF stages can import the engine on executors."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added, or local-only session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (narrow per-turn stage + wide
    per-conv assembly) over transcripts derived from sf0.001 documents."""
    _ensure_pkg_on_workers(spark)
    return Q.q_assemble_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pkg_on_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in Q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in Q.REGISTRY.items() if sql is not None}

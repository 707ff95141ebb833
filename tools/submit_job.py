"""spark-submit entrypoint for the extraction pipeline.

Usage (the --py-files deployment the north rule specifies):

    PYFILES=$(python -c "from scientific_papers_ocr_spark.session import package_zip; print(package_zip())")
    spark-submit --master local[16] --py-files "$PYFILES" \
        tools/submit_job.py <transcripts_parquet> <output_dir> [num_buckets] [--resume]

The script itself imports the engine ONLY from the shipped zip (it does not
assume the repo is on the driver's filesystem beyond this file), which is
exactly the cluster deployment contract.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    resume = "--resume" in sys.argv
    if len(args) < 2:
        raise SystemExit(__doc__)
    input_path, output_dir = args[0], args[1]
    num_buckets = int(args[2]) if len(args) > 2 else 64

    spark = SparkSession.builder.appName("transcript-extraction").getOrCreate()

    from scientific_papers_ocr_spark import pipeline, schemas

    transcripts = spark.read.schema(schemas.TRANSCRIPTS).parquet(input_path)
    out = pipeline.run_pipeline(
        spark, transcripts, output_dir=output_dir,
        num_buckets=num_buckets, resume=resume,
    )
    lineage = out["lineage"].collect()
    n_turns = sum(r["n_turns"] for r in lineage)
    n_convs = sum(r["n_convs"] for r in lineage)
    print(f"extraction complete: {n_turns} turns / {n_convs} convs "
          f"across {len(lineage)} buckets -> {output_dir}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Serial per-phase decomposition of the materialised pipeline at one or
more parallelism levels — the measurement behind the round-5 topology and
thread-envelope findings in BENCH/DRIFT.md.

Runs each stage of ``run_pipeline``'s materialised path as a separately
timed job (no driver-thread overlap, so each phase's wall time is
attributable), prints seconds + output file counts per phase, and the
per-phase scaling ratio when two levels are given.

Usage:
    python tools/phase_probe.py [corpus_parquet] [cores ...]

Defaults: the bench's bucket-aligned corpus and cores 8 2.  Generate the
corpus first with ``python -c "import bench; bench.ensure_corpus(
bench.BENCH_CONVS, aligned=True)"``.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scientific_papers_ocr_spark import pipeline  # noqa: E402
from scientific_papers_ocr_spark.operators import documents, turns as turns_op  # noqa: E402
from scientific_papers_ocr_spark.session import build_session  # noqa: E402
from scientific_papers_ocr_spark.sources import transcripts as tsrc  # noqa: E402

DEFAULT_CORPUS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "data", "transcripts_24000x50_b64.parquet",
)


def _nfiles(path: str) -> int:
    return sum(len(fs) for _, _, fs in os.walk(path))


def run(corpus: str, cores: int, clustered: bool = True) -> dict:
    spark = build_session(app_name=f"phase-probe-{cores}", cores=cores)
    df = spark.read.parquet(corpus)
    n = df.count()

    def warm(batches):
        for pdf in batches:
            yield pd.DataFrame({"x": [len(pdf)]})

    df.mapInPandas(warm, schema="x long").count()
    out_dir = os.path.join(os.path.dirname(corpus), f"phase_probe_{cores}")
    shutil.rmtree(out_dir, ignore_errors=True)
    ph: dict = {}
    dfb = pipeline.add_bucket(df, 64)
    turns_out = turns_op.extract_turns(
        dfb.drop("bucket"), num_buckets=64, page_text_mode="repaired_only"
    )
    t0 = time.time()
    tsrc.write_partitioned(turns_out, os.path.join(out_dir, "turns"), clustered=clustered)
    ph["turns_w"] = round(time.time() - t0, 2)
    ph["turns_files"] = _nfiles(os.path.join(out_dir, "turns"))
    all_turns = spark.read.schema(turns_out.schema).parquet(os.path.join(out_dir, "turns"))
    t0 = time.time()
    pipeline._probe_big_ids(dfb, 32768)
    ph["skew_probe"] = round(time.time() - t0, 2)
    t0 = time.time()
    pipeline.lineage_rows(all_turns).collect()
    ph["lineage_agg"] = round(time.time() - t0, 2)
    docs_out = documents.assemble_documents_from_input(dfb, all_turns)
    t0 = time.time()
    tsrc.write_partitioned(docs_out, os.path.join(out_dir, "docs"), clustered=clustered)
    ph["docs_w"] = round(time.time() - t0, 2)
    ph["docs_files"] = _nfiles(os.path.join(out_dir, "docs"))
    all_docs = spark.read.schema(docs_out.schema).parquet(os.path.join(out_dir, "docs"))
    spans_out = documents.explode_spans(all_docs)
    t0 = time.time()
    tsrc.write_partitioned(spans_out, os.path.join(out_dir, "spans"), clustered=clustered)
    ph["spans_w"] = round(time.time() - t0, 2)
    t0 = time.time()
    stats = all_docs.agg(
        F.count(F.lit(1)).alias("d"), F.sum("n_turns").alias("n")
    ).collect()[0]
    ph["final_agg"] = round(time.time() - t0, 2)
    assert stats["n"] == n, (stats["n"], n)
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return ph


def main() -> None:
    args = sys.argv[1:]
    corpus = args[0] if args and not args[0].isdigit() else DEFAULT_CORPUS
    levels = [int(a) for a in args if a.isdigit()] or [8, 2]
    results = {}
    for cores in levels:
        ph = run(corpus, cores)
        results[cores] = ph
        print(
            f"local[{cores}]: " + " ".join(f"{k}={v}" for k, v in ph.items()),
            flush=True,
        )
    if len(levels) == 2:
        few, many = results[min(levels)], results[max(levels)]
        print("\nper-phase scaling (few-core sec / many-core sec):")
        for k in few:
            if k.endswith("files"):
                continue
            ratio = few[k] / many[k] if many[k] else float("nan")
            print(f"  {k}: {few[k]} / {many[k]} = {ratio:.2f}x")


if __name__ == "__main__":
    main()

"""ANN ingest layout: bucket-partitioned write, partition-pruned probe, and
the incremental MERGE-style upsert (Iceberg ``MERGE INTO`` analog) whose
cost is bounded by the touched buckets."""

import os

import pytest
from pyspark.sql import functions as F

from scientific_papers_ocr_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def _files_per_bucket(path: str) -> dict[str, set[str]]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("lsh_bucket="):
            out[d] = set(os.listdir(os.path.join(path, d)))
    return out


def test_upsert_touches_only_new_buckets_and_stays_exact(spark, emb, tmp_path):
    path = str(tmp_path / "by_bucket")
    base = emb.where(F.col("vec_id") >= 20)
    similarity.write_bucket_partitioned(base, path, n_planes=6)
    before = _files_per_bucket(path)

    fresh = emb.where(F.col("vec_id") < 20)
    similarity.upsert_bucket_partitioned(spark, fresh, path, n_planes=6)
    after = _files_per_bucket(path)

    # untouched buckets keep their exact files
    touched = {
        f"lsh_bucket={r['lsh_bucket']}"
        for r in similarity.lsh_bucket(fresh, n_planes=6)
        .select("lsh_bucket").distinct().collect()
    }
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, d

    # layout now covers the full table exactly once per id
    merged = spark.read.parquet(path)
    assert merged.count() == emb.count()
    assert merged.select("vec_id").distinct().count() == emb.count()

    # probe over the upserted layout == brute-force ann over the full table
    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    pruned = similarity.ann_topk_pruned(merged, query, k=10, n_planes=6).collect()
    direct = similarity.ann_topk(emb, query, k=10, n_planes=6).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in direct]


def test_upsert_is_idempotent(spark, emb, tmp_path):
    path = str(tmp_path / "by_bucket")
    similarity.write_bucket_partitioned(emb.where(F.col("vec_id") >= 20), path, n_planes=6)
    fresh = emb.where(F.col("vec_id") < 20)
    similarity.upsert_bucket_partitioned(spark, fresh, path, n_planes=6)
    n1 = spark.read.parquet(path).count()
    # replaying the same ingest (at-least-once delivery) must converge
    similarity.upsert_bucket_partitioned(spark, fresh, path, n_planes=6)
    merged = spark.read.parquet(path)
    assert merged.count() == n1
    assert merged.select("vec_id").distinct().count() == n1


def test_ensure_ingest_invalidates_on_source_regeneration(
    spark, emb, tmp_path, monkeypatch
):
    """The on-disk ingest cache outlives sessions, so a regenerated source
    table (same path, new bytes — e.g. the driver rebuilding testdata
    between rounds) must force a re-ingest; an UNCHANGED source must not
    (the probe path stays read-only)."""
    from scientific_papers_ocr_spark import queries as Q

    sf_dir = tmp_path / "sfx"
    sf_dir.mkdir()
    emb.write.parquet(str(sf_dir / "embeddings.parquet"))
    monkeypatch.setattr(Q, "_ANN_INGEST_ROOT", str(tmp_path / "ingest"))

    path = Q.ensure_ann_ingest(spark, str(sf_dir), n_planes=6)
    n_full = spark.read.parquet(path).count()
    assert n_full == emb.count()
    marker = os.path.join(path, "_INGEST_SOURCE")
    sig1 = open(marker).read()

    # unchanged source: ensure is a no-op (marker content identical,
    # no rewrite — mtime of the marker is untouched)
    mtime1 = os.stat(marker).st_mtime_ns
    assert Q.ensure_ann_ingest(spark, str(sf_dir), n_planes=6) == path
    assert os.stat(marker).st_mtime_ns == mtime1

    # regenerated source (half the rows): the stale layout must be replaced
    import shutil

    small = emb.where(F.col("vec_id") % 2 == 0)
    tmp_src = str(sf_dir / "regen.parquet")
    small.write.parquet(tmp_src)
    shutil.rmtree(str(sf_dir / "embeddings.parquet"))
    os.rename(tmp_src, str(sf_dir / "embeddings.parquet"))

    assert Q.ensure_ann_ingest(spark, str(sf_dir), n_planes=6) == path
    assert open(marker).read() != sig1
    assert spark.read.parquet(path).count() == small.count()

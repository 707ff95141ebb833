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


def test_ingest_path_distinguishes_same_basename_corpora(tmp_path):
    """Two corpora at different paths with the same directory basename must
    map to distinct ingest layouts — otherwise alternating queries between
    them thrashes full re-ingests through the source-signature check."""
    from scientific_papers_ocr_spark import queries as Q

    a = str(tmp_path / "siteA" / "sf0.1")
    b = str(tmp_path / "siteB" / "sf0.1")
    assert Q.ann_ingest_path(a) != Q.ann_ingest_path(b)
    assert Q.ann_ingest_path(a) == Q.ann_ingest_path(a)  # stable
    assert Q.ivf_ingest_path(a) != Q.ivf_ingest_path(b)


def test_upsert_evicts_stale_row_when_update_moves_bucket(spark, emb, tmp_path):
    """Update-style merge: re-ingesting an id with a CHANGED embedding that
    hashes to a different lsh_bucket must evict the stale row from its old
    partition, not leave a duplicate vec_id that probes can return."""
    path = str(tmp_path / "by_bucket")
    similarity.write_bucket_partitioned(emb, path, n_planes=6)

    # pick an id and flip its embedding's sign — guaranteed different bucket
    # (every sign bit inverts), same vec_id
    victim = emb.where(F.col("vec_id") == 0)
    old_bucket = similarity.lsh_bucket(victim, n_planes=6).collect()[0]["lsh_bucket"]
    moved = victim.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    new_bucket = similarity.lsh_bucket(moved, n_planes=6).collect()[0]["lsh_bucket"]
    assert new_bucket != old_bucket

    similarity.upsert_bucket_partitioned(spark, moved, path, n_planes=6)
    merged = spark.read.parquet(path)
    rows = merged.where(F.col("vec_id") == 0).collect()
    assert len(rows) == 1, "stale duplicate survived the bucket-moving update"
    assert rows[0]["lsh_bucket"] == new_bucket
    assert merged.count() == emb.count()


def test_upsert_removes_directory_of_emptied_bucket(spark, emb, tmp_path):
    """The hard eviction case: the bucket-moving id was its old bucket's
    ONLY row.  The merged frame then has zero rows for that partition, and
    dynamic partition overwrite only replaces partitions present in the
    written data — without explicit directory deletion the stale partition
    (with the stale vec_id) survives on disk and probes can return it."""
    path = str(tmp_path / "by_bucket")
    victim = emb.where(F.col("vec_id") == 0)
    old_bucket = similarity.lsh_bucket(victim, n_planes=6).collect()[0]["lsh_bucket"]
    # base layout in which vec_id 0 is ALONE in its bucket: every other row
    # that would share old_bucket is excluded up front
    others = similarity.lsh_bucket(
        emb.where(F.col("vec_id") != 0), n_planes=6
    ).where(F.col("lsh_bucket") != old_bucket).drop("lsh_bucket")
    similarity.write_bucket_partitioned(others.unionByName(victim), path, n_planes=6)
    assert (
        spark.read.parquet(path)
        .where(F.col("lsh_bucket") == old_bucket)
        .count()
        == 1
    )

    moved = victim.withColumn("embedding", F.transform("embedding", lambda x: -x))
    new_bucket = similarity.lsh_bucket(moved, n_planes=6).collect()[0]["lsh_bucket"]
    assert new_bucket != old_bucket
    similarity.upsert_bucket_partitioned(spark, moved, path, n_planes=6)

    assert f"lsh_bucket={old_bucket}" not in _files_per_bucket(path), (
        "emptied bucket's stale partition directory survived the upsert"
    )
    merged = spark.read.parquet(path)
    rows = merged.where(F.col("vec_id") == 0).collect()
    assert len(rows) == 1
    assert rows[0]["lsh_bucket"] == new_bucket
    assert merged.select("vec_id").distinct().count() == merged.count()


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


def test_ensure_ingest_adopts_legacy_untagged_layout(
    spark, emb, tmp_path, monkeypatch
):
    """Layouts materialised under the pre-hash cache tag (bare corpus
    basename) are renamed into the tagged location instead of being
    orphaned and re-ingested from scratch — but only when their committed
    source signature matches this corpus; a same-basename stranger's
    layout is left alone and a fresh ingest runs."""
    from scientific_papers_ocr_spark import queries as Q

    sf_dir = tmp_path / "sfx"
    sf_dir.mkdir()
    emb.write.parquet(str(sf_dir / "embeddings.parquet"))
    monkeypatch.setattr(Q, "_ANN_INGEST_ROOT", str(tmp_path / "ingest"))

    # materialise a committed layout at the LEGACY path (bare basename tag)
    legacy = str(tmp_path / "ingest" / "sfx" / "embeddings_by_lsh6")
    similarity.write_bucket_partitioned(emb, legacy, n_planes=6)
    sig = Q._source_signature(str(sf_dir))
    Q._mark_ingest(legacy, sig)
    legacy_files = _files_per_bucket(legacy)

    path = Q.ensure_ann_ingest(spark, str(sf_dir), n_planes=6)
    assert path != legacy
    assert not os.path.exists(legacy), "legacy layout left orphaned"
    assert not os.path.exists(os.path.dirname(legacy)), "empty legacy dir kept"
    # adopted wholesale — the exact files moved, no re-ingest happened
    assert _files_per_bucket(path) == legacy_files

    # a legacy layout whose signature does NOT match this corpus stays put
    # and a fresh ingest runs under the tagged path
    stranger = str(tmp_path / "ingest" / "sfx" / "embeddings_by_ivf8")
    os.makedirs(stranger)
    open(os.path.join(stranger, "_SUCCESS"), "w").close()
    Q._mark_ingest(stranger, "someone-elses-corpus")
    ivf_path = Q.ensure_ivf_ingest(spark, str(sf_dir))
    assert os.path.exists(stranger), "mismatched-signature layout was adopted"
    assert spark.read.parquet(ivf_path).count() == emb.count()


def test_streaming_foreachbatch_upsert_converges_to_batch_layout(
    spark, emb, tmp_path
):
    """Continuous ANN ingest: embeddings arriving as a stream, each
    micro-batch MERGE-upserted into the bucket-partitioned layout via
    foreachBatch — after the stream drains, the layout is row-identical to
    a one-shot batch ingest of the same data, and the pruned probe over it
    matches the direct ANN answer.  (foreachBatch + idempotent upsert is
    the structured-streaming exactly-once sink recipe; redelivered batches
    converge by the upsert's idempotence.)"""
    src = tmp_path / "emb_stream"
    src.mkdir()
    # three micro-batch files (maxFilesPerTrigger=1)
    for i, pred in enumerate(
        ("vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2")
    ):
        emb.where(pred).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))

    layout = str(tmp_path / "by_bucket")
    # seed the layout (dynamic-overwrite upsert needs an existing table;
    # first micro-batch bootstraps it)
    bootstrap = {"done": False}

    def sink(batch_df, _bid):
        if not bootstrap["done"] and not os.path.exists(
            os.path.join(layout, "_SUCCESS")
        ):
            similarity.write_bucket_partitioned(batch_df, layout, n_planes=6)
            bootstrap["done"] = True
        else:
            similarity.upsert_bucket_partitioned(
                batch_df.sparkSession, batch_df, layout, n_planes=6
            )

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    merged = spark.read.parquet(layout)
    assert merged.count() == emb.count()
    assert merged.select("vec_id").distinct().count() == emb.count()

    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    pruned = similarity.ann_topk_pruned(merged, query, k=10, n_planes=6).collect()
    direct = similarity.ann_topk(emb, query, k=10, n_planes=6).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in direct]


def test_trained_quantizer_feeds_partitioned_ingest(spark, emb, tmp_path):
    """The full IVF lifecycle: train the coarse quantizer (Lloyd's), ingest
    partitioned by its cells, probe with pruning — same answer as the
    unpartitioned probe over the same trained centroids."""
    trained = similarity.train_ivf_centroids(emb, k=6, iters=3)
    path = str(tmp_path / "by_cell")
    similarity.write_ivf_partitioned(emb, trained, path)

    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    bucketed = spark.read.parquet(path)
    pruned = similarity.ivf_topk_pruned(
        bucketed, trained, query, k=10, n_probe=2
    ).collect()
    direct = similarity.ivf_topk(emb, trained, query, k=10, n_probe=2).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in direct]
    assert bucketed.count() == emb.count()

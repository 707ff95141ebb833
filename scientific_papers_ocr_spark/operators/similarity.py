"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k as pure column expressions
(``zip_with`` + ``aggregate`` — JVM-side, codegen'd, no Python).
Scale path: LSH bucketing via deterministic signed random projections so
the candidate set shrinks before exact scoring (IVF-style routing is the
same shape: route to nearest centroid bucket, score within bucket).

The projection weights are *portable hashes* — ``md5("rp:<plane>:<dim>")``
nibbles mapped to [-1, 1) — computed entirely JVM-side (``transform`` with
the element index), so:
- no driver-side ``collect``/``first`` anywhere (the query vector joins in
  as a broadcast single-row dim table and its bucket is computed on that
  one broadcast row);
- the exact same formula runs in any engine with md5 (the DuckDB oracle
  reproduces buckets bit-for-bit);
- at 100 TB the bucket id is a materialised partition column and the probe
  filter becomes partition pruning.

Recall characteristics (measured, see tests/test_operators.py planted-
neighbor tests): ANN recall is DATA-dependent.  On the uniform-random
fixture embeddings recall@10 approaches the probed fraction of the table
(LSH 6 planes / Hamming≤1 probes ~11% → recall 0.1–0.6; IVF n_probe=2 of
8 cells probes ~25% → 0.5–1.0) — on unclustered data no sublinear index
beats that, by design.  On clustered data (planted near-duplicates, the
training-data dedup case these operators exist for) both find the planted
cluster reliably: near-identical vectors agree on projection signs /
nearest centroid, so they co-bucket with the query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX = "0123456789abcdef"


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_to_query(df: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    """Cosine similarity of every row to a literal query vector — one narrow
    scan, no shuffle; the query rides along as a broadcast literal array."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    return df.withColumn(
        "cosine", F.round(_dot(v, q) / (_norm(v) * _norm(q)), 4)
    )


def brute_force_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k neighbours of a query vector.  The global top-k is a
    TakeOrderedAndProject (per-partition top-k then merge — no full sort
    shuffle); ties broken on the id for determinism."""
    return (
        cosine_to_query(df, query_vec, vec_col=vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _plane_weight(p: int, idx: Column) -> Column:
    """Deterministic pseudo-random weight in [-1, 1) for (plane ``p`` ≤ 7,
    0-based dim index ``idx``): nibbles ``4p..4p+3`` of ``md5('rp:<idx>')``
    as a 16-bit uint, affinely mapped.  Bit-identical in DuckDB.  Hot paths
    use ``_plane_weights_py`` (the same formula evaluated once at plan time)
    — this per-element expression remains as the exact fallback for
    dimensions beyond the precomputed range."""
    h = F.md5(F.format_string("rp:%d", idx))
    v = F.lit(0)
    for j in range(4):
        v = v + (
            F.instr(F.lit(_HEX), F.substring(h, 4 * p + j + 1, 1)) - 1
        ) * (16 ** (3 - j))
    return v / F.lit(32767.5) - F.lit(1.0)


# weights depend only on (plane, element index) — never on data — so the hot
# path bakes the first _PRE_DIM of them into literal arrays at plan time and
# row evaluation is a multiply-add per element instead of md5 + 24 substring/
# instr calls per (plane, element).  Values are bit-identical: the same
# integer nibble arithmetic and the same two IEEE-double ops, just evaluated
# once in Python instead of per row in the JVM (pinned by
# tests/test_operators.py::test_bucket_expr_matches_hashed_fallback).
_PRE_DIM = 1024


def _plane_weights_py(p: int, dim: int = _PRE_DIM) -> list[float]:
    import hashlib

    out = []
    for idx in range(dim):
        h = hashlib.md5(f"rp:{idx}".encode()).hexdigest()
        v = 0
        for j in range(4):
            v += _HEX.index(h[4 * p + j]) * (16 ** (3 - j))
        out.append(v / 32767.5 - 1.0)
    return out


# the literal weight array per plane, built ONCE per driver process:
# F.lit(list) costs one py4j round-trip per element (~0.5 s per 1024-long
# plane, dominating the query BUILD time), so the array goes through the SQL
# parser as a single `array(<repr>D, ...)` expression instead — one py4j
# call, and Double.parseDouble of Python's shortest round-trip repr
# reproduces each weight bit-for-bit.  Columns are immutable and
# session-independent, so caching per plane is safe.
_WEIGHT_COLS: dict[int, Column] = {}


def _plane_weights_lit(p: int) -> Column:
    col = _WEIGHT_COLS.get(p)
    if col is None:
        body = ",".join(repr(w) + "D" for w in _plane_weights_py(p))
        col = F.expr(f"array({body})")
        # fold the 1024-element array() call into ONE resolved Literal up
        # front: otherwise every query that embeds this column re-walks the
        # 1024-node unresolved tree through analysis + constant folding
        # (~1.5 s of driver time per ann query build, measured).  Best
        # effort — the parsed column above is semantically identical.
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            jdf = spark.range(1).select(col.alias("w"))._jdf
            jlit = jdf.queryExecution().optimizedPlan().expressions().apply(0).child()
            if jlit.getClass().getSimpleName() == "Literal":
                from pyspark.sql.column import Column as _PyColumn

                col = _PyColumn(
                    spark._jvm.org.apache.spark.sql.classic.ExpressionUtils.column(jlit)
                )
        except Exception:
            pass
        _WEIGHT_COLS[p] = col
    return col


def warm_plane_weights(n_planes: int = 8) -> None:
    """Fold every plane's literal weight array up front (requires an active
    session).  One-time per process (~0.15 s/plane); ingest entry points
    call this so the first probe query's build does not pay it."""
    for p in range(n_planes):
        _plane_weights_lit(p)


def bucket_expr(vec: Column, n_planes: int) -> Column:
    """Signed-random-projection bucket id: ``n_planes`` (≤ 8) sign bits
    packed into an int.  No dimension parameter — weights come from literal
    per-plane arrays for indices < ``_PRE_DIM`` (element_at on a plan-time
    constant) and fall back to the per-element hash expression beyond, so
    the expression works for any array length with identical results.

    Per-plane dot products run as separate folds in element order — the
    same left-to-right double accumulation per plane as the original fused
    fold, so the sums (and hence the sign bits) are bit-identical."""
    assert n_planes <= 8, "one md5 yields 32 nibbles = 8 plane weights"

    pairs = F.transform(
        vec, lambda x, i: F.struct(x.cast("double").alias("x"), i.alias("i"))
    )
    def make_update(p: int, weights: Column):
        def update(acc: Column, e: Column) -> Column:
            w = F.when(
                e["i"] < _PRE_DIM, F.element_at(weights, e["i"] + 1)
            ).otherwise(_plane_weight(p, e["i"]))
            return acc + e["x"] * w

        return update

    bucket = F.lit(0)
    for p in range(n_planes):
        dot = F.aggregate(
            pairs, F.lit(0.0), make_update(p, _plane_weights_lit(p))
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p)
    return bucket.cast("int")


def lsh_bucket(df: DataFrame, n_planes: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Attach the LSH bucket id column (narrow column math; bucketing the
    table by this id gives the ANN candidate partitioning)."""
    return df.withColumn("lsh_bucket", bucket_expr(F.col(vec_col), n_planes))


def _hamming(a: Column, b: Column, n_planes: int) -> Column:
    bits = [
        (a.bitwiseAND(F.lit(1 << p)) != b.bitwiseAND(F.lit(1 << p))).cast("int")
        for p in range(n_planes)
    ]
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def ann_topk(
    df: DataFrame,
    query: DataFrame | list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to rows whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe), then
    brute-force inside the candidate set.

    ``query`` is either a single-row DataFrame whose first column is the
    query vector (preferred — it broadcasts, its bucket is computed on the
    broadcast row, and nothing touches the driver) or a literal list.  At
    100 TB the bucket filter is a partition-pruning predicate on a
    bucket-partitioned table.
    """
    bucketed = lsh_bucket(df, n_planes=n_planes, vec_col=vec_col)
    if isinstance(query, DataFrame):
        qdim = query.select(
            F.col(query.columns[0]).alias("qvec")
        ).withColumn("q_bucket", bucket_expr(F.col("qvec"), n_planes))
        with_q = bucketed.crossJoin(F.broadcast(qdim))
    else:
        qvec = F.array(*[F.lit(float(x)) for x in query])
        with_q = bucketed.withColumn("qvec", qvec).withColumn(
            "q_bucket", bucket_expr(qvec, n_planes)
        )
    cand = with_q.where(
        _hamming(F.col("lsh_bucket"), F.col("q_bucket"), n_planes) <= probe_hamming
    )
    v = F.col(vec_col)
    return (
        cand.select(
            id_col,
            F.round(_dot(v, F.col("qvec")) / (_norm(v) * _norm(F.col("qvec"))), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def write_bucket_partitioned(
    df: DataFrame,
    path: str,
    n_planes: int = 6,
    vec_col: str = "embedding",
) -> None:
    """Ingest-time materialisation of the ANN layout: compute ``lsh_bucket``
    ONCE and write the table partitioned by it.  This is the 100 TB shape
    the module docstring promises — the md5-per-element bucket expression is
    paid a single time at ingest, and every later probe is partition pruning
    instead of a full-scan bucket recomputation.  ``repartition`` on the
    bucket first so each partition directory is written by one task (no
    tasks×buckets small-file explosion)."""
    bucketed = lsh_bucket(df, n_planes=n_planes, vec_col=vec_col)
    (
        bucketed.repartition("lsh_bucket")
        .write.mode("overwrite")
        .partitionBy("lsh_bucket")
        .parquet(path)
    )


def upsert_bucket_partitioned(
    spark,
    df_new: DataFrame,
    path: str,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental, idempotent ANN ingest — the Iceberg ``MERGE INTO``
    analog on the bucket-partitioned layout: bucket the new vectors, and
    dynamic-partition-overwrite ONLY the buckets they land in with
    (existing rows minus re-ingested ids) ∪ (new rows).

    Rewrite cost is bounded by the touched buckets, never the table:
    untouched bucket directories are not rewritten (dynamic overwrite
    leaves them in place), and the touched-bucket id set is broadcast.
    Re-running the same ingest converges, and update-style merges are
    handled too: a re-ingested id whose changed embedding moves it to a
    DIFFERENT bucket has its stale row evicted, because the touched-bucket
    set includes the buckets currently holding re-ingested ids (located by
    an id+bucket column-pruned semi-join over the existing table — the
    two-column scan is the price of MERGE semantics without an id→bucket
    index; Iceberg MERGE INTO pays the same join).  The same idempotence
    contract as the pipeline's lineage-committed bucket writes."""
    new_b = lsh_bucket(df_new, n_planes=n_planes, vec_col=vec_col)
    new_ids = new_b.select(id_col).distinct()
    # Buckets where re-ingested ids live TODAY — possibly different from the
    # bucket their new embedding hashes to.  Without this, a bucket-moving
    # update leaves a stale duplicate vec_id in the old (untouched) partition
    # that probes can still return.
    prior_buckets = (
        spark.read.parquet(path)
        .join(F.broadcast(new_ids), on=id_col, how="left_semi")
        .select("lsh_bucket")
    )
    touched = new_b.select("lsh_bucket").unionByName(prior_buckets).distinct()
    # Resolve the touched-bucket set ONCE (planning-sized: bounded by the
    # batch, never the table — the same budget Iceberg's MERGE metadata pass
    # pays) and feed the literal set back into the plan, so the semi-join
    # below doesn't re-run the prior-bucket location scan a second time.
    touched_set = {r[0] for r in touched.collect()}
    touched_lit = spark.createDataFrame(
        [(int(b),) for b in sorted(touched_set)], schema="lsh_bucket int"
    )
    existing = (
        spark.read.parquet(path)
        .join(F.broadcast(touched_lit), on="lsh_bucket", how="left_semi")
        .join(F.broadcast(new_ids), on=id_col, how="left_anti")
    )
    merged = existing.unionByName(new_b.select(existing.columns))
    # A bucket whose ONLY rows were re-ingested ids that moved elsewhere ends
    # up with ZERO rows in `merged` — and dynamic partition overwrite only
    # replaces partitions PRESENT in the written data, so its stale directory
    # would survive the write and probes could still return the evicted
    # vec_id.  Find those buckets BEFORE the write (after it, the lazy
    # `existing` plan would re-list a directory whose files the overwrite
    # deleted) and drop their partition directories once the overwrite has
    # committed.  `merged` is persisted around the kept-set collect and the
    # write so the merge plan executes ONCE — not recomputed per action —
    # and the written data cannot diverge from the kept-set decision.
    merged = merged.persist()
    try:
        kept_set = {r[0] for r in merged.select("lsh_bucket").distinct().collect()}
        (
            merged.repartition("lsh_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("lsh_bucket")
            .parquet(path)
        )
    finally:
        merged.unpersist()
    _delete_partition_dirs(
        spark,
        path,
        [f"lsh_bucket={b}" for b in sorted(touched_set - kept_set)],
    )


def _delete_partition_dirs(spark, path: str, partition_dirs: list[str]) -> None:
    """Remove partition directories through the Hadoop FileSystem API (works
    on local paths, HDFS and object stores alike) — the delete half of MERGE
    semantics that ``partitionOverwriteMode=dynamic`` cannot express for
    partitions with no surviving rows."""
    if not partition_dirs:
        return
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for d in partition_dirs:
        jpath = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{d}")
        jpath.getFileSystem(hconf).delete(jpath, True)


def probe_buckets(
    query: DataFrame, n_planes: int, probe_hamming: int = 1
) -> DataFrame:
    """The multi-probe bucket set for a (single-row, broadcastable) query
    DataFrame whose first column is the query vector: the query's own bucket
    plus every bucket within ``probe_hamming`` sign-bit flips (≤ 1
    supported).  Stays fully lazy — the bucket is computed on the one
    broadcast row, never on the driver."""
    assert probe_hamming <= 1, "multi-probe beyond 1 bit flip not implemented"
    qdim = query.select(F.col(query.columns[0]).alias("qvec")).withColumn(
        "q_bucket", bucket_expr(F.col("qvec"), n_planes)
    )
    probes = [F.col("q_bucket")]
    if probe_hamming >= 1:
        probes += [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    return qdim.select(
        "qvec", F.explode(F.array(*probes)).alias("probe_bucket")
    )


def ann_topk_pruned(
    bucketed: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """``ann_topk`` over a bucket-PARTITIONED table (``
    write_bucket_partitioned``): the probe set joins in as a broadcast dim
    table keyed on the partition column, so Spark's dynamic partition
    pruning restricts the scan to the probed bucket directories — the scan
    never reads, let alone re-hashes, the other buckets.  Result-identical
    to ``ann_topk`` on the same data (parity-tested); the probe set for
    Hamming ≤ 1 is exactly the bucket ids within one sign-bit flip."""
    probes = probe_buckets(query, n_planes, probe_hamming)
    cand = bucketed.join(
        F.broadcast(probes), bucketed[bucket_col] == probes["probe_bucket"]
    )
    v = F.col(vec_col)
    return (
        cand.select(
            id_col,
            F.round(_dot(v, F.col("qvec")) / (_norm(v) * _norm(F.col("qvec"))), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """IVF cell assignment: nearest centroid per vector (cosine), via a
    broadcast join against the (small) centroid table + per-row argmin —
    C rows per vector before the reduce, never a shuffle of the fact side.
    At ingest this materialises as the ``ivf_cell`` partition column, making
    probe-time routing partition pruning."""
    a = df.alias("a")
    c = centroids.alias("c")
    av, cv = F.col(f"a.{vec_col}"), F.col(f"c.{centroid_vec_col}")
    scored = a.join(F.broadcast(c)).select(
        f"a.{id_col}",
        F.col(f"c.{centroid_id_col}").alias("cand_cell"),
        F.round(_dot(av, cv) / (_norm(av) * _norm(cv)), 6).alias("cell_cos"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col("cand_cell"), F.struct(F.col("cell_cos"), -F.col("cand_cell"))
        ).alias("ivf_cell")
    )


def train_ivf_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_ids: list[int] | None = None,
) -> DataFrame:
    """Train the IVF coarse quantizer with distributed Lloyd's k-means —
    the FAISS ``train()`` analog (the registry's fixed first-8-vector
    centroids are the untrained degenerate case).

    Scale shape per iteration: ONE broadcast-join assignment pass over the
    fact table (``ivf_assign``'s plan) feeding per-cell (Σ vector, count)
    partials as D independent ``sum(embedding[d])`` aggregates — every one
    algebraic, so they combine map-side and the shuffle moves only k×D
    floats per map partition (a posexploded (cell, dim) key would shuffle
    E×D rows instead).  The k×D centroid update is a driver-side planning
    statistic (exactly what Spark MLlib's KMeans collects per iteration),
    then re-broadcast.  Iterative and non-SQL-expressible — a rows-only
    surface by design.

    Seeding is deterministic: ``seed_ids`` (default: the k smallest ids) —
    k-means|| is unnecessary at quantizer scale (k ≤ a few thousand).
    Empty cells keep their previous centroid (standard Lloyd fix)."""
    import numpy as np

    spark = df.sparkSession
    if seed_ids is None:
        seed = (
            df.orderBy(id_col).limit(k)
            .select(id_col, vec_col).collect()
        )
    else:
        seed = (
            df.where(F.col(id_col).isin(seed_ids))
            .orderBy(id_col).select(id_col, vec_col).collect()
        )
    cents = {i: np.asarray(r[vec_col], dtype=float) for i, r in enumerate(seed)}
    dim = len(next(iter(cents.values())))

    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in sorted(cents.items())],
            ["centroid_id", "centroid"],
        )
        assigned = ivf_assign(df, cdf, id_col=id_col, vec_col=vec_col)
        fact = df.select(id_col, vec_col).join(assigned, on=id_col)
        # per-cell (Σ vector, n) as D independent sum() aggregates — each is
        # algebraic, so partials combine map-side and the shuffle carries k
        # rows of D floats per map partition, never the fact vectors
        summed = fact.groupBy("ivf_cell").agg(
            F.array(
                *[F.sum(F.col(vec_col)[d].cast("double")) for d in range(dim)]
            ).alias("vec_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        stats = summed.collect()  # k rows × D floats: a planning statistic
        for r in stats:
            if r["n"] > 0:
                cents[r["ivf_cell"]] = np.asarray(r["vec_sum"], dtype=float) / r["n"]

    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in sorted(cents.items())],
        ["centroid_id", "centroid"],
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-routed approximate top-k: score the query against the centroid
    table (broadcast), probe the ``n_probe`` nearest cells, exact-score only
    vectors assigned there.  The alternative scale path to LSH bucketing —
    same shape as FAISS IVF-Flat: coarse quantizer → inverted lists → exact
    scan of probed lists."""
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    fact = df.join(assigned, on=id_col)

    q = query.select(F.col(query.columns[0]).alias("qvec"))
    qcells = (
        F.broadcast(q)
        .join(F.broadcast(centroids))
        .select(
            "qvec",
            F.col("centroid_id").alias("cell"),
            F.round(
                _dot(F.col("qvec"), F.col("centroid"))
                / (_norm(F.col("qvec")) * _norm(F.col("centroid"))),
                6,
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.col("cell"))
        .limit(n_probe)
    )
    cand = fact.join(
        F.broadcast(qcells), on=fact["ivf_cell"] == qcells["cell"]
    )
    v = F.col(vec_col)
    return (
        cand.select(
            id_col,
            F.round(_dot(v, F.col("qvec")) / (_norm(v) * _norm(F.col("qvec"))), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def write_ivf_partitioned(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest-time materialisation of the IVF layout: assign each vector to
    its nearest centroid ONCE and write the table partitioned by
    ``ivf_cell`` — the FAISS inverted-list structure as a table layout.
    Probes afterwards read only the probed cells' directories (partition
    pruning) instead of re-running the quantizer over the whole table."""
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    fact = df.join(assigned, on=id_col)
    (
        fact.repartition("ivf_cell")
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(path)
    )


def ivf_topk_pruned(
    bucketed: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``ivf_topk`` over an ``ivf_cell``-PARTITIONED table
    (``write_ivf_partitioned``): the query's ``n_probe`` nearest cells join
    in as a broadcast dim keyed on the partition column, so the scan
    dynamically prunes to the probed cell directories.  Result-identical to
    ``ivf_topk`` on the same data (parity-tested)."""
    q = query.select(F.col(query.columns[0]).alias("qvec"))
    qcells = (
        F.broadcast(q)
        .join(F.broadcast(centroids))
        .select(
            "qvec",
            F.col("centroid_id").alias("cell"),
            F.round(
                _dot(F.col("qvec"), F.col("centroid"))
                / (_norm(F.col("qvec")) * _norm(F.col("centroid"))),
                6,
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.col("cell"))
        .limit(n_probe)
    )
    cand = bucketed.join(F.broadcast(qcells), bucketed["ivf_cell"] == qcells["cell"])
    v = F.col(vec_col)
    return (
        cand.select(
            id_col,
            F.round(_dot(v, F.col("qvec")) / (_norm(v) * _norm(F.col("qvec"))), 4).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def most_similar_segment(
    df: DataFrame,
    segments_col: str = "segments",
    query_col: str = "query",
    id_col: str = "doc_id",
) -> DataFrame:
    """O3 similarity-argmax analog (``find_most_similar_segment``,
    static_method_classes.py:52-73): for each row, the segment most similar
    to the query text.

    The reference scores SentenceTransformer-embedding cosine per segment
    and keeps the first strict maximum; the clean-room scorer is token-set
    cosine (|A∩B| / sqrt(|A||B|) over distinct lower-cased words) — pure
    column math, deterministic, engine-portable.  Argmax via a bounded
    per-row reduce, ties to the earliest segment (the reference's
    strictly-greater update rule)."""
    words = lambda c: F.array_distinct(F.split(F.lower(c), " "))  # noqa: E731
    seg = df.select(
        id_col,
        F.col(query_col).alias("q"),
        F.posexplode(segments_col).alias("seg_idx", "segment"),
    )
    inter = F.size(F.array_intersect(words(F.col("segment")), words(F.col("q"))))
    denom = F.sqrt(
        F.size(words(F.col("segment"))).cast("double")
        * F.size(words(F.col("q"))).cast("double")
    )
    scored = seg.select(
        id_col,
        "seg_idx",
        F.round(inter / denom, 4).alias("seg_cosine"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col("seg_idx"), F.struct(F.col("seg_cosine"), -F.col("seg_idx"))
        ).alias("best_seg_idx"),
        F.max(F.struct(F.col("seg_cosine"), -F.col("seg_idx")))["seg_cosine"].alias(
            "best_cosine"
        ),
    )


def pairwise_cosine_knn(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_planes: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All-pairs k-NN restricted to LSH co-buckets (embedding near-dup
    detection): join within bucket, exact cosine, per-row top-k window.
    No driver collect — the bucket id needs no dimension probe.

    At corpus scale the within-bucket join is quadratic in bucket size, so
    size ``bucket_planes`` for the corpus (≈log2(n/target_bucket)) and set
    ``max_bucket_size`` as the guardrail: buckets are deterministically
    truncated (rank by id) so one hot bucket can never go quadratic —
    bounded recall loss instead of an unbounded straggler."""
    from pyspark.sql import Window

    bucketed = lsh_bucket(df, n_planes=bucket_planes, vec_col=vec_col)
    if max_bucket_size is not None:
        wb = Window.partitionBy("lsh_bucket").orderBy(id_col)
        bucketed = (
            bucketed.withColumn("_rn", F.row_number().over(wb))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(b, on="lsh_bucket")
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (_norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.col("id_b"))
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

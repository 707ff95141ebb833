"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k as pure column expressions
(``zip_with`` + ``aggregate`` — JVM-side, codegen'd, no Python).
Scale path: LSH bucketing via deterministic signed random projections so
the candidate set shrinks before exact scoring (IVF-style routing is the
same shape: route to nearest centroid bucket, score within bucket).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


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


def _projection_matrix(dim: int, n_planes: int, seed: str = "rp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG state;
    reproducible across drivers/executors/rounds)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        counter = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{counter}".encode()).digest()
            for i in range(0, 16, 2):
                u = int.from_bytes(h[i : i + 2], "big") / 65535.0
                vals.append(2.0 * u - 1.0)
            counter += 1
        planes.append(vals[:dim])
    return planes


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Signed-random-projection bucket id per row: ``n_planes`` sign bits
    packed into an int.  Narrow column math; bucketing the table by this id
    gives the ANN candidate partitioning."""
    bucket = F.lit(0)
    for p, plane in enumerate(_projection_matrix(dim, n_planes)):
        pv = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col(vec_col), pv) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit * (2 ** p)
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to rows whose LSH bucket is
    within ``probe_hamming`` bits of the query's bucket (multi-probe), then
    brute-force inside the candidate set.  At 100 TB the bucket filter is a
    partition-pruning predicate on a bucket-partitioned table."""
    dim = len(query_vec)
    planes = _projection_matrix(dim, n_planes)
    qbits = [1 if sum(a * b for a, b in zip(plane, query_vec)) >= 0 else 0 for plane in planes]
    qbucket = sum(bit << p for p, bit in enumerate(qbits))
    probe = {qbucket}
    if probe_hamming >= 1:
        for p in range(n_planes):
            probe.add(qbucket ^ (1 << p))
    bucketed = lsh_bucket(df, dim, n_planes=n_planes, vec_col=vec_col)
    candidates = bucketed.where(F.col("lsh_bucket").isin(*sorted(probe)))
    return brute_force_topk(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pairwise_cosine_knn(
    df: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding", bucket_planes: int = 4
) -> DataFrame:
    """All-pairs k-NN restricted to LSH co-buckets (embedding near-dup
    detection): join within bucket, exact cosine, per-row top-k window."""
    from pyspark.sql import Window

    dim_row = df.select(F.size(vec_col).alias("d")).first()
    bucketed = lsh_bucket(df, dim_row["d"], n_planes=bucket_planes, vec_col=vec_col)
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

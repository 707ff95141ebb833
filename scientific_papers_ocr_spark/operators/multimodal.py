"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The image/audio codecs aren't available in this container, so the decode
kernels are STUBS behind ``_decode_available()`` — but the Spark-side
contract is real and tested: schemas, Arrow batch shapes, ``mapInPandas``
signatures, and partitioning all behave exactly as they would with a real
codec; only the innermost bytes→pixels call is faked deterministically.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: md5-derived floats.
    Replace with the real codec path when the decode libs exist; the Spark
    plumbing around it does not change."""
    h = hashlib.md5(payload or b"").digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65535.0 for i in range(n_features)]


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Binary payloads → fixed-width feature vectors via Arrow-batched
    ``mapInPandas`` (the real shape for any decode/resize/frame-sample
    kernel: bytes in, numeric arrays out, no row-at-a-time Python)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [_fake_decode_features(p, n_features) for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(process, schema=FEATURES)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize kernel.  STUB: raises unless a codec is present — the
    partition/batch plumbing (select → mapInPandas → binary out) is the
    production shape."""
    if not _decode_available():
        raise NotImplementedError(
            "image codec not available in this environment; resize_images is "
            "a stub — extract_features demonstrates the identical plumbing"
        )
    raise NotImplementedError("real codec path not implemented in-sandbox")


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling kernel.  STUB (see ``resize_images``)."""
    raise NotImplementedError(
        "video codec not available in this environment; sample_frames is a "
        "stub — extract_features demonstrates the identical plumbing"
    )


def write_media_files(
    df: DataFrame,
    out_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    ext: str = "bin",
) -> None:
    """S9 image-file sink analog: executor-side per-partition writer that
    streams each row's binary payload to ``<out_dir>/<media_id>.<ext>`` —
    the reference writes rasterized page images next to the transcription
    (check_transcription.py:170-187 hierarchy).  Local-FS semantics; an
    object store swaps the ``open`` for its client with the same
    ``foreachPartition`` shape (no driver collect, no payload shuffle).
    """
    import os

    def write_partition(rows) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            payload = r[payload_col]
            with open(os.path.join(out_dir, f"{r[id_col]}.{ext}"), "wb") as f:
                f.write(bytes(payload) if payload is not None else b"")

    df.select(id_col, payload_col).foreachPartition(write_partition)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes derived
    from md5(seed, i)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "payload": bytearray(payload),
                "meta": {
                    "media_id": f"m{i:05d}",
                    "kind": ("image", "audio", "video")[i % 3],
                    "mime": ("image/png", "audio/wav", "video/mp4")[i % 3],
                    "width": 64 + i,
                    "height": 48 + i,
                    "duration_ms": 1000 * (i % 5),
                },
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA)

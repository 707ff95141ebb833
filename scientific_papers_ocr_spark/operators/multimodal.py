"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The image/audio codecs aren't available in this container, so the single
bytes→pixels decode call (``_fake_decode_pixels``) is a DETERMINISTIC FAKE
— clearly marked, one-function swap for PIL/cv2 when the libs exist.
Everything around that seam is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning, the vectorized bilinear
resample (``resize_bilinear``) and the frame-sampling arithmetic
(``sample_frames``).
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


def _fake_decode_pixels(payload: bytes, width: int, height: int) -> "np.ndarray":
    """DETERMINISTIC FAKE DECODE — the codec seam.  Derives an
    (height, width, 3) uint8 array from the payload bytes via a seeded PCG64
    stream (platform-stable).  Swap this one function for
    ``PIL.Image.open(...)`` / ``cv2.imdecode`` when the codec libs exist;
    everything downstream (resize math, batch shapes, schemas) is real and
    unchanged."""
    import numpy as np

    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def resize_bilinear(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """REAL bilinear image resize, fully vectorized numpy (half-pixel-center
    convention, like PIL/OpenCV default).  This is the production kernel —
    only the bytes→pixels decode ahead of it is faked in-sandbox."""
    import numpy as np

    h, w = img.shape[:2]
    x = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    wy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),  # raw RGB, h*w*3
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over Arrow-batched ``mapInPandas``: decode (codec seam —
    deterministic fake in-sandbox, see ``_fake_decode_pixels``) at the
    meta-declared source dimensions, then a REAL vectorized bilinear resample
    (``resize_bilinear``) to (width, height); raw RGB bytes out.  No
    shuffle — per-row narrow work, pixels never leave the task."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for payload, w, h in zip(
                pdf["payload"], pdf["src_width"], pdf["src_height"]
            ):
                img = _fake_decode_pixels(
                    bytes(payload) if payload is not None else b"",
                    int(w) if pd.notna(w) else 16,
                    int(h) if pd.notna(h) else 16,
                )
                out_payload.append(resize_bilinear(img, width, height).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": [width] * len(out_payload),
                    "height": [height] * len(out_payload),
                }
            )

    src = media.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("src_width"),
        F.col("meta.height").alias("src_height"),
    )
    return src.mapInPandas(process, schema=RESIZED)


FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),  # raw RGB, h*w*3
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling over ``mapInPandas``: REAL sampling arithmetic —
    frames at t = 0, every_ms, 2*every_ms, … strictly below
    ``meta.duration_ms`` — with the per-timestamp decode going through the
    codec seam (fake in-sandbox: frame pixels derived from payload ⊕
    frame_idx).  1→N row fan-out inside the Arrow batch, no explode shuffle;
    at scale the frame stream stays partition-local until a later stage
    keys it."""
    if every_ms <= 0:
        # fail at plan time with a clear message, not inside the mapInPandas
        # task as an opaque executor error (range() arg 3 must not be zero)
        raise ValueError(f"every_ms must be a positive interval, got {every_ms}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [],
                "frame": [], "width": [], "height": [],
            }
            for payload, mid, dur, w, h in zip(
                pdf["payload"], pdf["media_id"], pdf["duration_ms"],
                pdf["src_width"], pdf["src_height"],
            ):
                dur = int(dur) if pd.notna(dur) else 0
                w = int(w) if pd.notna(w) else 16
                h = int(h) if pd.notna(h) else 16
                raw = bytes(payload) if payload is not None else b""
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    frame = _fake_decode_pixels(
                        raw + idx.to_bytes(4, "big"), w, h
                    )
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(frame.tobytes())
                    rows["width"].append(w)
                    rows["height"].append(h)
            yield pd.DataFrame(rows)

    src = media.where(F.col("meta.kind") == "video").select(
        "media_id",
        "payload",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.width").alias("src_width"),
        F.col("meta.height").alias("src_height"),
    )
    return src.mapInPandas(process, schema=FRAMES)


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

"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The image/audio libraries are NOT in this container,
so the decode kernels are STUBS — a deterministic fake behind the real Spark
plumbing (schema, partitioning, UDF signature, batch shape), with the
library-backed path gated behind import-try and raising NotImplementedError
when genuinely invoked without the lib.

At 100 TB the payload column dominates I/O: the patterns that matter are
(a) metadata-only pruning — filter on the typed struct BEFORE the decode
stage so parquet column pruning skips payload bytes for dropped rows;
(b) size-aware repartition before decode (one 4K video != one thumbnail);
(c) decode emits features, never re-emits payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the real decode path (absent in this container)
    import PIL.Image as _PIL  # noqa: N814
except ImportError:
    _PIL = None

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META_TYPE, False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("phash", T.StringType(), False),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), False),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      media_type: str = "image") -> DataFrame:
    """Typed metadata from the raw bytes — pure column expressions, so
    Catalyst can prune/filter on meta without touching payloads downstream."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(f"{media_type}/synthetic").alias("mime"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("checksum"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode: dimensions and mean
    luminance derived from the bytes themselves."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_luma = (sum(payload[:256]) / max(1, min(n, 256))) / 255.0
    return width, height, round(mean_luma, 6)


def decode_image_features(media: DataFrame, use_library: bool = False) -> DataFrame:
    """Arrow-batched decode -> feature rows. ``use_library=True`` requires a
    real imaging lib (not in this container -> NotImplementedError); the
    default path runs the deterministic fake through identical plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if use_library:
                if _PIL is None:
                    raise NotImplementedError(
                        "image decode requires PIL/pillow, which is not "
                        "installed in this container; run with "
                        "use_library=False for the deterministic fake"
                    )
                raise NotImplementedError("library decode path is a stub")
            rows = {"media_id": [], "width": [], "height": [],
                    "mean_luma": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, luma = _fake_decode(bytes(payload))
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_luma"].append(luma)
                rows["phash"].append(
                    hashlib.md5(bytes(payload)[:64]).hexdigest()[:16]
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video-typed payloads: deterministic byte-stride
    'frames' (the real path would seek keyframes); one output row per frame —
    a controlled explode whose fan-out is capped by max_frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n_frames):
                    chunk = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_checksum"].append(
                        hashlib.md5(chunk).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def size_aware_repartition(media: DataFrame, target_bytes_per_partition: int,
                           total_bytes: int | None = None) -> DataFrame:
    """Repartition so each decode task gets ~equal BYTES, not equal rows —
    one 50 MB video and a thousand 10 KB thumbnails are not the same task."""
    if total_bytes is None:
        total_bytes = media.select(
            F.sum(F.col("meta.n_bytes")).alias("s")
        ).collect()[0].s or 0
    n_parts = max(1, int(total_bytes // target_bytes_per_partition) + 1)
    return media.repartition(n_parts)

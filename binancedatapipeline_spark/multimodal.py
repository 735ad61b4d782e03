"""Multimodal columns: images/audio/video as opaque binary + metadata.

The pattern for a 100 TB multimodal training-data pipeline:

- media travels as an opaque ``binary`` column plus a typed metadata
  struct (mime, width/height/duration, codec), so the relational
  planner can filter/partition on metadata WITHOUT touching bytes —
  predicate pushdown keeps undecoded media out of the shuffle;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` kernels (one Python worker per
  partition, zero-copy batch transfer), never per-row UDFs;
- decoded outputs are fixed-size arrays (embeddings, thumbnails) so
  downstream ops are ordinary array-column plans.

The actual codec libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the decode kernels are STUBBED: ``decode_image`` with
``fake=True`` produces a deterministic pixel tensor derived from the
bytes (tests exercise the full Spark plumbing — schema, batching,
partitioning); with ``fake=False`` it raises NotImplementedError at
the exact point a real decoder plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])


def with_content_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata from bytes without decoding: size + sha256 —
    the dedup/partition key for binary content."""
    return df.withColumn("n_bytes", F.length(content_col).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def _be_uint(col: str, pos: int, n: int) -> F.Column:
    """Big-endian unsigned int from ``n`` bytes at 1-based ``pos``."""
    return F.conv(F.hex(F.expr(f"substring({col}, {pos}, {n})")), 16, 10).cast("long")


def _le_uint(col: str, pos: int, n: int) -> F.Column:
    """Little-endian unsigned int: reverse the byte order, then conv."""
    parts = [F.hex(F.expr(f"substring({col}, {pos + i}, 1)")) for i in range(n - 1, -1, -1)]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def with_image_dims(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Width/height/format from container HEADERS — no decode, no
    Python, no shuffle: magic-byte dispatch plus fixed-offset integer
    reads as pure JVM expressions. This is how a 100 TB media table
    gets filterable dimension metadata (``WHERE width >= 512``)
    without ever shipping bytes to a decoder.

    Parses PNG (IHDR, big-endian), GIF87a/89a (LE u16) and BMP
    (BITMAPINFOHEADER, LE u32; height is abs()'d — negative encodes
    top-down row order). JPEG dimensions live in a variable-offset
    SOF marker, which is a scan, not a fixed read — those rows (and
    unknown formats) get format + NULL dims; route them through the
    mapInPandas decode kernel instead."""
    c = content_col
    magic8 = F.hex(F.expr(f"substring({c}, 1, 8)"))
    magic3 = F.hex(F.expr(f"substring({c}, 1, 3)"))
    magic2 = F.hex(F.expr(f"substring({c}, 1, 2)"))
    fmt = (
        F.when(magic8 == "89504E470D0A1A0A", F.lit("png"))
        .when(magic3 == "474946", F.lit("gif"))
        .when(magic2 == "424D", F.lit("bmp"))
        .when(magic2 == "FFD8", F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    out = df.withColumn("img_format", fmt)
    width = (
        F.when(F.col("img_format") == "png", _be_uint(c, 17, 4))
        .when(F.col("img_format") == "gif", _le_uint(c, 7, 2))
        .when(F.col("img_format") == "bmp", _le_uint(c, 19, 4))
    )
    height = (
        F.when(F.col("img_format") == "png", _be_uint(c, 21, 4))
        .when(F.col("img_format") == "gif", _le_uint(c, 9, 2))
        .when(
            F.col("img_format") == "bmp",
            # LE s32: values >= 2^31 are negative (top-down BMP)
            F.abs(
                F.when(
                    _le_uint(c, 23, 4) >= F.lit(1 << 31),
                    _le_uint(c, 23, 4) - F.lit(1 << 32),
                ).otherwise(_le_uint(c, 23, 4))
            ),
        )
    )
    return out.withColumn("img_width", width).withColumn("img_height", height)


def _fake_decode(content: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in decoder: pixels derived from a sha256
    keystream of the bytes. Same shape/dtype contract as a real
    decoder (H, W, 3 uint8)."""
    h, w = out_hw
    need = h * w * 3
    seed = hashlib.sha256(content or b"").digest()
    reps = (need // len(seed)) + 1
    buf = (seed * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def decode_and_featurize(
    media: DataFrame,
    out_hw: tuple[int, int] = (8, 8),
    fake: bool = True,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode → resize → flatten to a float feature vector, as an
    Arrow-batched kernel. Output: (media_id, feature: array<float>,
    mean_intensity: double).

    Repartition upstream by content-size buckets if batches skew —
    each Arrow batch holds the decoded tensors of its rows in
    memory."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("mean_intensity", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means = [], []
            for content in pdf[content_col]:
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/libvips — plug in here"
                    )
                px = _fake_decode(bytes(content) if content is not None else b"", out_hw)
                flat = (px.astype(np.float32) / 255.0).reshape(-1)
                feats.append(flat)
                means.append(float(px.mean()))
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "feature": feats,
                "mean_intensity": means,
            })

    return media.mapInPandas(kernel, out_schema)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    n_frames_col: str = "n_frames",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices
    0, every_n, 2*every_n, ... < n_frames. Pure relational — the
    decode of each sampled frame is a later decode_and_featurize
    pass over (media_id, frame_idx)."""
    return media.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )

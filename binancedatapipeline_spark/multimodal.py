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


# SOF marker bytes carrying frame dimensions: C0-C3, C5-C7, C9-CB,
# CD-CF (C4=DHT, C8=JPG extension, CC=DAC carry no dims)
_JPEG_SOF = "192,193,194,195,197,198,199,201,202,203,205,206,207"


def _jpeg_sof_offset(c: str) -> F.Column:
    """1-based offset of the JPEG SOF marker's 0xFF byte, or ≤0 when
    absent/corrupt — a BOUNDED segment walk (48 segments) as one JVM
    ``aggregate`` over a constant sequence, carrying the byte offset
    in the accumulator. Each step reads the segment length field and
    hops; standalone markers (RST, padding 0xFF fill) advance without
    a length; SOS (0xDA, start of entropy data) aborts. Still a pure
    per-row projection — no Python, no shuffle; EXIF/ICC blocks are
    single segments, so 48 hops covers any sane header."""
    b = f"`{c}`"
    mk = (
        lambda off: f"cast(conv(hex(substring({b}, cast({off} as int), 1)), 16, 10) as int)"
    )
    seglen = (
        f"cast(conv(hex(substring({b}, cast(acc.off + 2 as int), 2)), 16, 10) as bigint)"
    )
    return F.expr(
        f"""
        aggregate(
          sequence(1, 48),
          named_struct('off', cast(3 as bigint), 'sof', cast(0 as bigint)),
          (acc, i) -> CASE
            WHEN acc.sof > 0 OR acc.off <= 0 OR acc.off + 8 > length({b}) THEN acc
            WHEN {mk('acc.off')} <> 255
              THEN named_struct('off', cast(-1 as bigint), 'sof', acc.sof)
            WHEN {mk('acc.off + 1')} = 255
              THEN named_struct('off', acc.off + 1, 'sof', acc.sof)
            WHEN {mk('acc.off + 1')} in ({_JPEG_SOF})
              THEN named_struct('off', acc.off, 'sof', acc.off)
            WHEN {mk('acc.off + 1')} = 218
              THEN named_struct('off', cast(-1 as bigint), 'sof', acc.sof)
            WHEN {mk('acc.off + 1')} between 208 and 215 OR {mk('acc.off + 1')} = 1
              THEN named_struct('off', acc.off + 2, 'sof', acc.sof)
            ELSE named_struct('off', acc.off + 2 + {seglen}, 'sof', acc.sof)
          END,
          acc -> acc.sof
        )
        """
    )


def _jpeg_dim(c: str, field_off: int) -> F.Column:
    """BE u16 at SOF + field_off (height: +5, width: +7), valid only
    where ``__jpeg_sof`` > 0."""
    b = f"`{c}`"
    return F.expr(
        f"cast(conv(hex(substring({b}, cast(__jpeg_sof + {field_off} as int), 2)), 16, 10) as bigint)"
    )


def with_image_dims(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Width/height/format from container HEADERS — no decode, no
    Python, no shuffle: magic-byte dispatch plus fixed-offset integer
    reads as pure JVM expressions. This is how a 100 TB media table
    gets filterable dimension metadata (``WHERE width >= 512``)
    without ever shipping bytes to a decoder.

    Parses PNG (IHDR, big-endian), GIF87a/89a (LE u16), BMP
    (BITMAPINFOHEADER, LE u32; height is abs()'d — negative encodes
    top-down row order), and JPEG — whose dimensions live in a
    variable-offset SOF marker, handled by a bounded JVM-side segment
    walk (:func:`_jpeg_sof_offset`) rather than a fixed read.
    Truncated/corrupt rows and unknown formats get format + NULL
    dims; route those through the mapInPandas decode kernel."""
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
    out = df.withColumn("img_format", fmt).withColumn(
        "__jpeg_sof",
        F.when(fmt == "jpeg", _jpeg_sof_offset(c)).otherwise(F.lit(None)),
    )
    jpeg_ok = (F.col("img_format") == "jpeg") & (F.col("__jpeg_sof") > 0)
    width = (
        F.when(F.col("img_format") == "png", _be_uint(c, 17, 4))
        .when(F.col("img_format") == "gif", _le_uint(c, 7, 2))
        .when(F.col("img_format") == "bmp", _le_uint(c, 19, 4))
        .when(jpeg_ok, _jpeg_dim(c, 7))
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
        .when(jpeg_ok, _jpeg_dim(c, 5))
    )
    return (
        out.withColumn("img_width", width)
        .withColumn("img_height", height)
        .drop("__jpeg_sof")
    )


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

    ``fake=False`` uses Pillow when importable on the executors
    (decode → RGB → bilinear resize to ``out_hw``); where Pillow is
    absent — it is not in this container — the kernel raises
    NotImplementedError at the exact plug point, so the real-decoder
    contract stays an honest documented stub rather than silently
    falling back to the fake. ``fake=True`` keeps the deterministic
    sha256-keystream decoder for plumbing tests.

    Repartition upstream by content-size buckets if batches skew —
    each Arrow batch holds the decoded tensors of its rows in
    memory."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("mean_intensity", T.DoubleType()),
    ])

    def _real_decode(content: bytes) -> np.ndarray:
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode requires Pillow on the executors "
                "(pip install pillow) — plug in here"
            ) from exc
        import io

        h, w = out_hw
        img = Image.open(io.BytesIO(content)).convert("RGB").resize((w, h))
        return np.asarray(img, dtype=np.uint8)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means = [], []
            for content in pdf[content_col]:
                raw = bytes(content) if content is not None else b""
                px = _fake_decode(raw, out_hw) if fake else _real_decode(raw)
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

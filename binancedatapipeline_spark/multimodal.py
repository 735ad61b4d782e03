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


def _wav_chunk_walk(c: str) -> F.Column:
    """RIFF chunk walk for WAVE content, the audio analog of
    :func:`_jpeg_sof_offset`: a BOUNDED (16-chunk) JVM ``aggregate``
    that hops chunk headers (4-byte id + LE u32 size, data padded to
    even) looking for ``fmt `` and ``data``. Returns
    struct(fmt_off, data_size): the 1-based offset of the fmt chunk's
    payload (>0 when found) and the data chunk's byte size (≥0 when
    found, else -1). Pure per-row projection — no Python, no shuffle;
    real-world WAVs put LIST/INFO/fact chunks between fmt and data,
    which is exactly what the walk (vs a fixed 44-byte assumption)
    absorbs."""
    b = f"`{c}`"
    cid = f"hex(substring({b}, cast(acc.off as int), 4))"
    csize = (
        "cast(conv(concat("
        + ",".join(
            f"hex(substring({b}, cast(acc.off + {4 + i} as int), 1))"
            for i in (3, 2, 1, 0)
        )
        + "), 16, 10) as bigint)"
    )
    return F.expr(
        f"""
        aggregate(
          sequence(1, 16),
          named_struct('off', cast(13 as bigint),
                       'fmt_off', cast(-1 as bigint),
                       'data_size', cast(-1 as bigint)),
          (acc, i) -> CASE
            WHEN (acc.fmt_off > 0 AND acc.data_size >= 0)
                 OR acc.off + 8 > length({b}) + 1 THEN acc
            WHEN {cid} = '666D7420'
              THEN named_struct('off', acc.off + 8 + {csize} + ({csize} % 2),
                                'fmt_off', acc.off + 8,
                                'data_size', acc.data_size)
            WHEN {cid} = '64617461'
              THEN named_struct('off', acc.off + 8 + {csize} + ({csize} % 2),
                                'fmt_off', acc.fmt_off,
                                'data_size', {csize})
            ELSE named_struct('off', acc.off + 8 + {csize} + ({csize} % 2),
                              'fmt_off', acc.fmt_off,
                              'data_size', acc.data_size)
          END,
          acc -> named_struct('fmt_off', acc.fmt_off, 'data_size', acc.data_size)
        )
        """
    )


def _le_uint_at(c: str, delta: int, n: int) -> F.Column:
    """Little-endian unsigned int at column offset ``__fmt + delta``
    (1-based) — field reads relative to the discovered fmt payload."""
    b = f"`{c}`"
    parts = [
        F.hex(F.expr(f"substring({b}, cast(__fmt + {delta + i} as int), 1)"))
        for i in range(n - 1, -1, -1)
    ]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def with_audio_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Audio metadata from container HEADERS — no decode, no Python,
    no shuffle (the audio analog of :func:`with_image_dims`): format
    dispatch by magic bytes, then for WAV a bounded RIFF chunk walk
    extracting channels, sample rate, bits per sample and duration —
    so a 100 TB audio table is filterable (``WHERE sample_rate >=
    16000 AND duration_ms BETWEEN …``) without shipping bytes to a
    decoder.

    WAV gets full metadata. MP3/FLAC/OGG are format-detected only
    (their rates live in bit-packed frame headers) — NULL meta routes
    them through the mapInPandas decode kernel. Truncated or corrupt
    WAVs yield NULL fields, never an error."""
    c = content_col
    b = f"`{c}`"
    riff = F.expr(f"hex(substring({b}, 1, 4))") == "52494646"
    wave = F.expr(f"hex(substring({b}, 9, 4))") == "57415645"
    magic4 = F.hex(F.expr(f"substring({b}, 1, 4)"))
    magic3 = F.hex(F.expr(f"substring({b}, 1, 3)"))
    magic2 = F.hex(F.expr(f"substring({b}, 1, 2)"))
    fmt = (
        F.when(riff & wave, F.lit("wav"))
        .when(magic4 == "664C6143", F.lit("flac"))
        .when(magic4 == "4F676753", F.lit("ogg"))
        .when(magic3 == "494433", F.lit("mp3"))  # ID3 tag prefix
        .when(magic2.isin("FFFB", "FFF3", "FFF2"), F.lit("mp3"))
        .otherwise(F.lit("unknown"))
    )
    out = df.withColumn("audio_format", fmt).withColumn(
        "__wav",
        F.when(fmt == "wav", _wav_chunk_walk(c)).otherwise(F.lit(None)),
    )
    ok = (F.col("audio_format") == "wav") & (F.col("__wav.fmt_off") > 0)
    out = out.withColumn("__fmt", F.when(ok, F.col("__wav.fmt_off")))
    # PCM fmt payload layout (offsets from the payload start):
    # +0 audio_format u16, +2 channels u16, +4 sample_rate u32,
    # +8 byte_rate u32, +14 bits_per_sample u16
    out = (
        out.withColumn("audio_channels", F.when(ok, _le_uint_at(c, 2, 2)))
        .withColumn("audio_sample_rate", F.when(ok, _le_uint_at(c, 4, 4)))
        .withColumn("__byte_rate", F.when(ok, _le_uint_at(c, 8, 4)))
        .withColumn("audio_bits", F.when(ok, _le_uint_at(c, 14, 2)))
    )
    duration = F.when(
        ok & (F.col("__wav.data_size") >= 0) & (F.col("__byte_rate") > 0),
        F.round(F.col("__wav.data_size") * 1000.0 / F.col("__byte_rate")).cast(
            "long"
        ),
    )
    return (
        out.withColumn("audio_duration_ms", duration)
        .drop("__wav", "__fmt", "__byte_rate")
    )


def sample_audio_windows(
    media: DataFrame,
    window_ms: int = 30_000,
    hop_ms: int | None = None,
    duration_col: str = "audio_duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Fixed-window sampling plan for audio rows (the audio analog of
    :func:`sample_frames`): explode window starts 0, hop, 2·hop … <
    duration into (id, window_idx, start_ms, end_ms); the decode of
    each window is a later mapInPandas pass over those coordinates.
    Rows with NULL/zero duration produce no windows."""
    hop = hop_ms or window_ms
    starts = F.sequence(
        F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(hop)
    )
    return (
        media.filter(F.col(duration_col) > 0)
        .select(
            id_col,
            F.posexplode(starts).alias("window_idx", "start_ms"),
            F.col(duration_col),
        )
        .select(
            id_col,
            "window_idx",
            "start_ms",
            F.least(
                F.col("start_ms") + window_ms, F.col(duration_col)
            ).alias("end_ms"),
        )
    )


def _mp4_box_walk(
    c: str,
    start_expr: str,
    end_expr: str,
    hops: int,
    target: str = "mvhd",
    stop_at_hit: bool = False,
) -> F.Column:
    """Bounded ISO-BMFF (MP4/MOV) box walk as one JVM ``aggregate``
    (the RIFF/JPEG technique): boxes are [u32 size][4cc type][payload],
    ``size==1`` reads a 64-bit largesize at +8, ``size==0`` means
    to-end-of-enclosure. Walks the sibling chain in
    [``start_expr``, ``end_expr``), recording the offset and end of
    the first ``target`` box and counting ``trak`` boxes — ONE walker
    serves both levels (top level: target ``moov``, traks count 0;
    inside moov: target ``mvhd``). Corrupt sizes abort to -1;
    everything stays a per-row projection (no Python, no shuffle)."""
    b = f"`{c}`"
    u32 = lambda off: f"cast(conv(hex(substring({b}, cast(({off}) as int), 4)), 16, 10) as bigint)"
    u64 = lambda off: f"cast(conv(hex(substring({b}, cast(({off}) as int), 8)), 16, 10) as bigint)"
    typ = lambda off: f"cast(substring({b}, cast(({off}) + 4 as int), 4) as string)"
    sz = u32("acc.off")
    nxt = (
        f"CASE WHEN {sz} = 0 THEN cast(({end_expr}) as bigint) "
        f"WHEN {sz} = 1 THEN acc.off + {u64('acc.off + 8')} "
        f"WHEN {sz} < 8 THEN cast(-1 as bigint) "
        f"ELSE acc.off + {sz} END"
    )
    return F.expr(
        f"""
        aggregate(
          sequence(1, {hops}),
          named_struct('off', cast(({start_expr}) as bigint),
                       'hit', cast(0 as bigint),
                       'hit_end', cast(0 as bigint),
                       'traks', cast(0 as bigint)),
          (acc, i) -> CASE
            WHEN acc.off <= 0 OR acc.off + 8 > cast(({end_expr}) as bigint) THEN acc
            {"WHEN acc.hit > 0 THEN acc" if stop_at_hit else ""}
            WHEN {typ('acc.off')} = '{target}' AND acc.hit = 0
              THEN named_struct('off', {nxt}, 'hit', acc.off,
                                'hit_end', {nxt}, 'traks', acc.traks)
            WHEN {typ('acc.off')} = 'trak'
              THEN named_struct('off', {nxt}, 'hit', acc.hit,
                                'hit_end', acc.hit_end, 'traks', acc.traks + 1)
            ELSE named_struct('off', {nxt}, 'hit', acc.hit,
                              'hit_end', acc.hit_end, 'traks', acc.traks)
          END,
          acc -> acc
        )
        """
    )


def _mp4_moov_bounds(c: str, hops: int = 16) -> F.Column:
    """(moov, moov_end) of the first TOP-LEVEL ``moov`` box, or
    (0, 0) — moov legitimately sits before OR after a multi-GB
    ``mdat`` (faststart vs capture order), so the walk hops over
    either. Same walker as the child scan, targeted at ``moov`` —
    with the short-circuit on (traks aren't counted at top level, so
    hopping past the hit would be pure wasted per-row CPU)."""
    walk = _mp4_box_walk(
        c, "1", f"length(`{c}`) + 1", hops, target="moov", stop_at_hit=True
    )
    return F.struct(
        walk["hit"].alias("moov"), walk["hit_end"].alias("moov_end")
    )


def with_video_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Video metadata from container HEADERS — the video leg of the
    image/audio/video metadata triple (:func:`with_image_dims` /
    :func:`with_audio_meta`): no decode, no Python, no shuffle, so a
    100 TB media table is filterable (``WHERE video_duration_ms
    BETWEEN …``) before any frame ever reaches a decoder, and
    :func:`sample_frames` gets its duration from the same projection.

    Parses ISO-BMFF (MP4/MOV/3GP…): major brand from ``ftyp``, then a
    bounded box walk to ``moov`` (before or after ``mdat``) and over
    its children for ``mvhd`` (v0 and v1 layouts) — yielding
    ``video_brand``, ``video_timescale``, ``video_duration_ms`` and
    ``video_tracks``. Non-BMFF bytes are format-detected only (webm/
    avi) or ``unknown``; truncated/corrupt boxes yield NULL fields,
    never an error."""
    c = content_col
    b = f"`{c}`"
    ftyp = F.expr(f"cast(substring({b}, 5, 4) as string)") == "ftyp"
    magic4 = F.hex(F.expr(f"substring({b}, 1, 4)"))
    riff_avi = (magic4 == "52494646") & (
        F.expr(f"cast(substring({b}, 9, 4) as string)") == "AVI "
    )
    first_type = F.expr(f"cast(substring({b}, 5, 4) as string)")
    bmff = ftyp | first_type.isin("moov", "mdat", "free", "skip", "wide")
    fmt = (
        F.when(ftyp, F.lit("mp4"))
        .when(bmff, F.lit("mp4"))  # headerless BMFF (no ftyp)
        .when(magic4 == "1A45DFA3", F.lit("webm"))  # EBML
        .when(riff_avi, F.lit("avi"))
        .otherwise(F.lit("unknown"))
    )
    out = df.withColumn("video_format", fmt).withColumn(
        "video_brand",
        F.when(ftyp, F.expr(f"cast(substring({b}, 9, 4) as string)")),
    )
    out = out.withColumn(
        "__moov",
        F.when(F.col("video_format") == "mp4", _mp4_moov_bounds(c)),
    )
    has_moov = F.col("__moov.moov") > 0
    out = out.withColumn(
        "__scan",
        F.when(
            has_moov,
            _mp4_box_walk(c, "__moov.moov + 8", "__moov.moov_end", 24),
        ),
    )
    # a file truncated INSIDE the mvhd payload must yield NULLs, not a
    # partial-byte garbage integer: require the declared mvhd box to
    # lie fully within the bytes we actually have. hit_end > hit also
    # rejects the walker's -1 corrupt-size sentinel (an mvhd declaring
    # size 2-7), which would otherwise pass the length bound.
    mvhd_ok = (
        (F.col("__scan.hit") > 0)
        & (F.col("__scan.hit_end") > F.col("__scan.hit"))
        & (F.col("__scan.hit_end") <= F.length(F.col(c)) + 1)
    )
    ver = F.when(mvhd_ok, _be_uint_at(c, "__scan.hit + 8", 1))
    timescale = F.when(
        mvhd_ok,
        F.when(ver == 1, _be_uint_at(c, "__scan.hit + 28", 4)).otherwise(
            _be_uint_at(c, "__scan.hit + 20", 4)
        ),
    )
    duration = F.when(
        mvhd_ok,
        F.when(ver == 1, _be_uint_at(c, "__scan.hit + 32", 8)).otherwise(
            _be_uint_at(c, "__scan.hit + 24", 4)
        ),
    )
    return (
        out.withColumn("video_timescale", timescale)
        .withColumn("video_tracks", F.when(mvhd_ok, F.col("__scan.traks")))
        .withColumn(
            "video_duration_ms",
            F.when(
                mvhd_ok & (timescale > 0),
                F.round(duration * 1000.0 / timescale).cast("long"),
            ),
        )
        .drop("__moov", "__scan")
    )


def _be_uint_at(c: str, off_expr: str, n: int) -> F.Column:
    """Big-endian unsigned int of ``n`` bytes at a column-computed
    1-based offset expression."""
    return F.expr(
        f"cast(conv(hex(substring(`{c}`, cast(({off_expr}) as int), {n})), 16, 10) as bigint)"
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

    # project to exactly the kernel's inputs before the Python
    # boundary: mapInPandas is opaque to Catalyst, so without the
    # select every other column of `media` would be read, transposed
    # to Arrow and shipped to the worker for nothing (guide §4.1)
    return media.select(id_col, content_col).mapInPandas(kernel, out_schema)


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

"""Corpus file-format sources: WARC/WET (Common Crawl's plain-text
extraction format) as a pure DataFrame scan.

A WET file is a sequence of records, each introduced by a
``WARC/1.0`` version line, followed by ``Header: value`` lines, a
blank line, and the extracted plain text. The classic Hadoop trick —
split records on the version marker via a custom record delimiter —
is expressible entirely in the DataFrame reader (``lineSep``), so
record assembly, header parsing and text extraction are all JVM
column expressions: no RDDs, no Python, and the scan parallelizes
per file split like any text read. (WET files are usually .gz —
gzip is splittable per FILE, not per block, so at 100 TB the
parallel unit is the file, which is how Common Crawl shards them:
~100k files per crawl.)

Every downstream operator in this package (curation, dedup, DSIR,
quality filtering, packing) consumes the (doc_id, url, text) shape
this produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_HDR_BODY_SPLIT = r"\r?\n\r?\n"  # first blank line ends the header block


def parse_wet_records(rec: DataFrame, min_length: int = 1,
                      keep_headers: bool = False) -> DataFrame:
    """The shared WET parse: ``rec`` is the record-split relation
    (one row per ``WARC/1.0`` fragment, column ``value``) from either
    the batch or the streaming text reader — every expression below
    is a pure per-row projection, so the same plan runs identically
    in both modes (the package's stream≡batch discipline)."""
    rec = rec.filter(
        # NB: Spark's trim() strips 0x20 only — newline edges need regex
        F.length(F.regexp_replace("value", r"^\s+|\s+$", "")) > 0
    )
    # header block = everything before the first blank line (DOTALL:
    # the block spans multiple header lines; each record fragment
    # begins with the newline that followed the split marker)
    header = F.regexp_extract("value", rf"(?s)^(.*?){_HDR_BODY_SPLIT}", 1)
    body = F.regexp_replace("value", rf"(?s)^.*?{_HDR_BODY_SPLIT}", "")

    def hdr(name: str) -> F.Column:
        return F.regexp_extract(
            F.col("__hdr"), rf"(?mi)^{name}:\s*(.*?)\s*$", 1
        )

    return (
        rec.withColumn("__hdr", header)
        .withColumn("__body", body)
        .filter(F.lower(hdr("WARC-Type")) == "conversion")
        .select(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        hdr("WARC-Record-ID"), r"<?([^<>]+)>?", 1
                    ),
                    F.lit(""),
                ),
                F.md5(F.col("__body").cast("binary")),
            ).alias("doc_id"),
            hdr("WARC-Target-URI").alias("url"),
            # try_-variants, not cast/to_timestamp: a record missing a
            # header yields '' from regexp_extract, and ANSI mode
            # (Spark 4 default) makes a plain cast of '' THROW — a
            # malformed crawl record must yield NULL, not kill the scan
            F.try_to_timestamp(F.nullif(hdr("WARC-Date"), F.lit(""))).alias(
                "fetch_time"
            ),
            hdr("Content-Length").try_cast("long").alias("length"),
            # the body carries the record separator's blank lines;
            # strip whitespace EDGES only, never interior whitespace
            # (regex, not trim() — trim strips spaces, not \r\n)
            F.regexp_replace("__body", r"^\s+|\s+$", "").alias("text"),
            *([F.col("__hdr").alias("headers")] if keep_headers else []),
        )
        .filter(F.length("text") >= min_length)
    )


def read_wet(
    spark: SparkSession,
    path: str,
    min_length: int = 1,
    keep_headers: bool = False,
) -> DataFrame:
    """Read WARC/WET file(s) into (doc_id, url, fetch_time, length,
    text) — one row per ``conversion`` record (the plain-text
    documents); the leading ``warcinfo`` record and empty fragments
    are dropped.

    ``doc_id`` is the record's WARC-Record-ID when present (the
    stable choice for dedup/splits), else a content hash.
    ``keep_headers`` adds the raw header block for debugging."""
    rec = spark.read.option("lineSep", "WARC/1.0").text(path)
    return parse_wet_records(rec, min_length, keep_headers)


def read_wet_stream(
    spark: SparkSession,
    path: str,
    min_length: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WET ingest: watch ``path`` for arriving .wet[.gz]
    files and emit parsed documents per micro-batch — the front end
    for ``stream_curate``/``stream_incremental_dedup``/
    ``stream_span_dedup``. Same record split, SAME parse expressions
    as :func:`read_wet` (one implementation, batch and stream cannot
    drift)."""
    reader = spark.readStream.option("lineSep", "WARC/1.0")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_wet_records(reader.text(path), min_length)


def with_url_parts(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Add ``host``, ``domain`` (registrable-ish: last two labels),
    ``path`` and ``url_canonical`` — the crawl pipeline's URL
    normalization (RefinedWeb/CCNet run URL-level dedup before any
    content pass). Canonicalization: lowercase scheme+host, strip the
    fragment, drop tracking query params (utm_*, fbclid, gclid,
    ref), drop a trailing "/" — all JVM ``parse_url``/regex, no UDF.

    The two-label ``domain`` is a heuristic, not a public-suffix-list
    lookup ("example.co.uk" → "co.uk"); for per-site grouping at
    quality-analysis fidelity, join a real PSL table instead."""
    u = F.col(url_col)
    # try_parse_url: an invalid URL must yield NULL parts (and pass
    # through canonicalization untouched), not kill the scan — crawl
    # URL fields are adversarial input by definition
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    # drop tracking params, then any leftover leading/trailing separators
    q_clean = F.regexp_replace(
        F.coalesce(query, F.lit("")),
        r"(?i)(^|&)(utm_[^=&]*|fbclid|gclid|ref)=[^&]*",
        "",
    )
    q_clean = F.regexp_replace(q_clean, r"^&+|&+$", "")
    path_norm = F.regexp_replace(F.coalesce(path, F.lit("")), r"/+$", "")
    canonical = F.concat(
        scheme, F.lit("://"), host, path_norm,
        F.when(q_clean != "", F.concat(F.lit("?"), q_clean)).otherwise(F.lit("")),
    )
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        df.withColumn("host", host)
        .withColumn("domain", domain)
        .withColumn("path", path_norm)
        .withColumn(
            "url_canonical",
            F.when(host.isNull() | (host == ""), u).otherwise(canonical),
        )
    )


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = "fetch_time",
) -> DataFrame:
    """URL-level dedup: one row per canonical URL — keep the LATEST
    fetch when ``order_col`` is given (ties broken deterministically),
    else an arbitrary-but-deterministic min. One shuffle on the
    canonical URL; runs before any content-level pass because it
    needs no text comparison at all."""
    from binancedatapipeline_spark.operators.dedup import dedup_keep_last

    tmp = with_url_parts(df, url_col)
    if order_col is not None:
        out = dedup_keep_last(tmp, ["url_canonical"], order_col)
    else:
        w = Window.partitionBy("url_canonical").orderBy(F.col(url_col).asc())
        out = (
            tmp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out.drop("host", "domain", "path", "url_canonical")

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HDR_BODY_SPLIT = r"\r?\n\r?\n"  # first blank line ends the header block


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
    rec = (
        spark.read.option("lineSep", "WARC/1.0").text(path)
        # NB: Spark's trim() strips 0x20 only — newline edges need regex
        .filter(F.length(F.regexp_replace("value", r"^\s+|\s+$", "")) > 0)
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

    out = (
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
    return out

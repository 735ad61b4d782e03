"""Corpus file-format sources: WET (Common Crawl's plain-text
extraction format) and full WARC (raw crawl responses, with HTML→text
extraction) as pure DataFrame scans, plus a binary decode kernel for
encoded WARC payloads.

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

import re as _re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_HDR_BODY_SPLIT = r"\r?\n\r?\n"  # first blank line ends the header block

# The record separator is ANCHORED: the WARC spec mandates CRLF header
# lines and a CRLF CRLF record terminator, so every record boundary in
# a compliant file is exactly "\r\nWARC/1.0\r\n". Splitting on the bare
# marker (round 6) tore records whose EXTRACTED TEXT contained the
# literal "WARC/1.0" (pages about web archiving do) — extracted WET
# text uses \n line endings, so "\nWARC/1.0\n" in a body no longer
# matches, and the torn-tail silent text loss is gone. A body would
# have to contain the full CRLF-framed marker to tear (i.e. embed a
# raw WARC excerpt verbatim), which the docstring documents as the
# residual limit of delimiter-based splitting.
_RECORD_SEP = "\r\nWARC/1.0\r\n"


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
    # header block = everything before the first blank line. split(…,
    # limit=2) is ONE linear pass; the `(?s)^(.*?)blank` extract form
    # it replaces backtracked over the whole multi-KB record per field
    # (measured: the split form is ~1.3× faster end-to-end on the WARC
    # twin of this parse, tools/bench_warc).
    # F.get (never ANSI-throwing element_at) yields NULL when there is
    # no blank line — a headers-only fragment gets body "".
    # The anchored separator leaves the very FIRST record of a file
    # with its leading "WARC/1.0" version line — strip it so every
    # fragment parses identically.
    parts = F.split(F.col("value"), _HDR_BODY_SPLIT, 2)
    header = F.regexp_replace(F.get(parts, 0), r"^WARC/1\.0\r?\n", "")
    body = F.coalesce(F.get(parts, 1), F.lit(""))

    def hdr(name: str) -> F.Column:
        # nullif (inside _hdr): a MISSING header must be NULL
        # downstream, never '' — '' is a value ('' == '' groups/joins;
        # NULL does not), and the URL dedup pass must not collapse all
        # URI-less records into one '' group (round-6 finding)
        return _hdr(F.col("__hdr"), name)

    # strip whitespace EDGES only, never interior whitespace (regex,
    # not trim() — trim strips spaces, not \r\n)
    text = F.regexp_replace("__body", r"^\s+|\s+$", "")
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
                # hash the STRIPPED text: __body still carries record-
                # terminator CRLFs whose count depends on file position
                # (mid-file vs EOF) — identical content must get one id
                F.md5(text.cast("binary")),
            ).alias("doc_id"),
            hdr("WARC-Target-URI").alias("url"),
            # try_-variants, not cast/to_timestamp: a malformed header
            # value must yield NULL under ANSI mode (Spark 4 default),
            # not kill the scan
            F.try_to_timestamp(hdr("WARC-Date")).alias("fetch_time"),
            hdr("Content-Length").try_cast("long").alias("length"),
            text.alias("text"),
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
    rec = spark.read.option("lineSep", _RECORD_SEP).text(path)
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
    reader = spark.readStream.option("lineSep", _RECORD_SEP)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_wet_records(reader.text(path), min_length)


# ---------------------------------------------------------------------------
# Full WARC (response records): the step BEFORE the WET extraction —
# raw crawl archives where each record carries the HTTP exchange
# (status line + headers) and the HTML payload. A CCNet/RefinedWeb-
# style pipeline starts here: parse responses, keep 200/text-html,
# extract text from the markup, then feed the same downstream the WET
# reader feeds. Same anchored record split, same JVM-projection
# discipline (reference app/src has no crawl sources at all; this and
# the WET reader extend the training-data suite per the brief).
#
# Two readers, one schema: read_warc rides the TEXT reader — the
# zero-Python fast path for identity-encoded UTF-8 payloads.
# read_warc_binary is the general case (Content-Encoding-compressed
# bodies, non-UTF-8 charsets) as a binaryFile + mapInPandas decode
# kernel — the multimodal module's pattern. Pick per shard; the
# downstream extraction (extract_documents) is identical.


def _hdr(block, name: str) -> F.Column:
    """``Header: value`` lookup inside a CRLF header block — NULL (not
    ``''``) when absent, so missing headers never collapse into one
    joinable/groupable empty-string value (the round-6 lesson)."""
    return F.nullif(
        F.regexp_extract(block, rf"(?mi)^{name}:\s*(.*?)\s*$", 1),
        F.lit(""),
    )


def _canon_encoding(enc: F.Column) -> F.Column:
    """Identity-equivalent Content-Encoding labels → NULL ("the html
    value is plain text"); anything else passes through. Shared
    canonicalization so the two WARC readers agree row-for-row on
    identity records."""
    return F.when(enc.isin("identity", "none"), F.lit(None)).otherwise(enc)


def parse_warc_responses(rec: DataFrame, keep_http_headers: bool = False) -> DataFrame:
    """Parse record-split WARC fragments (column ``value``) into one
    row per ``response`` record: ``(doc_id, url, fetch_time,
    http_status, content_type, charset, content_encoding, html)``.
    Request/metadata/
    warcinfo records are dropped. Every expression is a per-row JVM
    projection — no Python, no shuffle; batch and streaming share
    this one implementation like the WET parse does."""
    rec = rec.filter(
        F.length(F.regexp_replace("value", r"^\s+|\s+$", "")) > 0
    )
    # one linear split per boundary (limit=2), not a DOTALL backtrack
    # over the record per field — see the parse_wet_records note
    # (measured ~1.3× end-to-end, tools/bench_warc)
    parts = F.split(F.col("value"), _HDR_BODY_SPLIT, 2)
    warc_hdr = F.regexp_replace(F.get(parts, 0), r"^WARC/1\.0\r?\n", "")
    # everything after the WARC header block = the HTTP exchange;
    # HTTP headers end at the next blank line. A record with no blank
    # line after the HTTP block is headers-only: F.get yields NULL
    # (never the ANSI element_at throw) → body coalesces to "",
    # NOT to a copy of the headers
    rest = F.coalesce(F.get(parts, 1), F.lit(""))
    out = (
        rec.withColumn("__hdr", warc_hdr)
        .withColumn("__rest", rest)
        .filter(F.lower(_hdr(F.col("__hdr"), "WARC-Type")) == "response")
        .withColumn("__hparts", F.split(F.col("__rest"), _HDR_BODY_SPLIT, 2))
        .withColumn("__http", F.get(F.col("__hparts"), 0))
        .withColumn(
            "__body", F.coalesce(F.get(F.col("__hparts"), 1), F.lit(""))
        )
    )
    http = F.col("__http")
    text = F.regexp_replace("__body", r"^\s+|\s+$", "")
    return out.select(
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    _hdr(F.col("__hdr"), "WARC-Record-ID"), r"<?([^<>]+)>?", 1
                ),
                F.lit(""),
            ),
            # hash the STRIPPED text, not __body: __body still carries
            # record-terminator CRLFs whose count depends on the
            # record's file position (mid-file vs EOF), which would
            # make ids for identical content unstable — and this is
            # the form the binary kernel's fallback matches
            F.md5(text.cast("binary")),
        ).alias("doc_id"),
        _hdr(F.col("__hdr"), "WARC-Target-URI").alias("url"),
        F.try_to_timestamp(_hdr(F.col("__hdr"), "WARC-Date")).alias("fetch_time"),
        # minor version optional: wget2/browsertrix record "HTTP/2 200"
        F.regexp_extract(http, r"^HTTP/\d(?:\.\d)?\s+(\d{3})", 1)
        .try_cast("int")
        .alias("http_status"),
        F.nullif(
            F.lower(
                F.regexp_extract(http, r"(?mi)^content-type:\s*([^;\r\n]+?)\s*(?:;|\r|\n|$)", 1)
            ),
            F.lit(""),
        ).alias("content_type"),
        F.nullif(
            F.lower(
                F.regexp_extract(
                    http, r"""(?mi)^content-type:[^\r\n]*charset=["']?([\w.-]+)""", 1
                )
            ),
            F.lit(""),
        ).alias("charset"),
        # the encoding still APPLIED to the html value: the text
        # reader cannot decompress, so a non-identity header rides
        # along and extract_documents excludes the row (the binary
        # kernel decodes and reports NULL here). Without this column
        # a compressed 200/text-html record would flow downstream as
        # mojibake "text". Identity-equivalent labels (identity, the
        # nonstandard none) canonicalize to NULL so both readers emit
        # the same value for the same plain-text record
        _canon_encoding(F.lower(_hdr(http, "Content-Encoding"))).alias(
            "content_encoding"
        ),
        text.alias("html"),
        *([F.col("__http").alias("http_headers")] if keep_http_headers else []),
    )


def read_warc(
    spark: SparkSession, path: str, keep_http_headers: bool = False
) -> DataFrame:
    """Read full WARC file(s) into one row per HTTP ``response``
    record — the raw-crawl front end (see :func:`warc_documents` for
    the extracted-text shape downstream operators consume). Gzip is
    transparent per file, like the WET reader."""
    rec = spark.read.option("lineSep", _RECORD_SEP).text(path)
    return parse_warc_responses(rec, keep_http_headers)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: same record split, same parse
    expressions as :func:`read_warc` (stream ≡ batch by
    construction)."""
    reader = spark.readStream.option("lineSep", _RECORD_SEP)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_warc_responses(reader.text(path))


# block-level elements become line breaks so extracted text keeps the
# page's paragraph/list/heading structure (what line-based curation —
# clean_lines, frequent_lines — operates on)
_HTML_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|blockquote|"
    "section|article|header|footer|nav|pre|hr|dd|dt|dl|figure|"
    "figcaption|form|aside|main|title|option|select"
)
# named entities a regex pipeline can decode without per-row Python;
# &amp; must decode LAST or "&amp;lt;" would double-decode to "<"
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
)


def html_to_text(html) -> F.Column:
    """Markup → plain text as a chain of JVM ``regexp_replace`` —
    zero Python, zero shuffle, whole-stage-codegen at any scale.

    The heuristic (a deliberate, documented trade against a real DOM
    parser, which would be a per-row Python kernel ~100× slower):
    drop comments and script/style/noscript/template subtrees, turn
    block-level tags into line breaks, strip remaining tags, decode
    the common named entities, collapse whitespace. Attribute values
    containing a literal ``>`` tear that one tag (regex, not a
    parser); numeric entities beyond the quote forms pass through
    undecoded. For boilerplate-heavy pages, compose with the curation
    stages built for exactly that (``clean_lines``,
    ``frequent_lines``, ``gopher_filter``)."""
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"\r\n?", "\n")
    # comments × scripts nest both ways, and each order of two blind
    # passes loses real text one way: comments-first lets a "<!--"
    # inside script code swallow body text to the next "-->";
    # scripts-first lets an UNPAIRED "<script...>" inside a comment
    # swallow body text to the next real "</script>". Three passes:
    # 1. comments that contain no CLOSING skip-element tag — safe
    #    either way (an opening tag inside a comment is not a real
    #    script start; a "<!--" inside a script always has "</script"
    #    before its "-->", so such a span is never matched here);
    c = F.regexp_replace(
        c,
        r"(?is)<!--(?:(?!</(?:script|style|noscript|template)).)*?-->",
        " ",
    )
    # 2. script/style subtrees (any commented-out unpaired openings
    #    are gone, so the lazy match starts at a real element);
    c = F.regexp_replace(
        c, r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", " "
    )
    # 3. remaining comments (including remnants of comments that
    #    WRAPPED a complete script pair removed by pass 2)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, rf"(?i)</?(?:{_HTML_BLOCK_TAGS})\b[^>]*/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"&amp;", "&")
    c = F.regexp_replace(c, r"[ \t\f\x0B]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_title(html) -> F.Column:
    """The ``<title>`` text (entity-decoded, whitespace-collapsed),
    NULL when absent — the usual lightweight quality/metadata signal
    alongside the extracted body."""
    c = F.col(html) if isinstance(html, str) else html
    return F.nullif(
        html_to_text(F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)),
        F.lit(""),
    )


def extract_links(html) -> F.Column:
    """Array of the page's outbound link targets: every ``href``
    attribute of an ``<a>`` tag (single-, double- and un-quoted forms;
    entity ``&amp;`` decoded; fragment-only/`javascript:`/`mailto:`
    targets dropped). Pure JVM regex — the same extraction discipline
    as :func:`html_to_text`, and the same documented limit (a regex
    over markup, not a DOM parser)."""
    c = F.col(html) if isinstance(html, str) else html
    hrefs = F.regexp_extract_all(
        c,
        F.lit(r'(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|' + r"'([^']*)'|([^\s>]+))"),
        1,
    )
    return F.filter(
        F.transform(
            hrefs,
            lambda h: F.regexp_replace(
                F.regexp_replace(h, r"""^["']|["']$""", ""), r"&amp;", "&"
            ),
        ),
        lambda u: (u != "")
        & ~u.startswith("#")
        & ~F.lower(u).startswith("javascript:")
        & ~F.lower(u).startswith("mailto:"),
    )


def host_edges(
    docs: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
) -> DataFrame:
    """Distinct ``(src, dst)`` host-level link edges from per-page
    outlink arrays — the input shape
    :func:`operators.pagerank.pagerank` ranks (the Common-Crawl-style
    host authority graph). Relative links (no host of their own)
    parse to a NULL dst and are dropped as unparseable — they are NOT
    resolved against the page's host (a same-host edge would only
    fall to the self-loop filter anyway, so the outcome is identical;
    resolution would matter only if self-loops ever became
    meaningful). Rows with an unparseable page URL contribute
    nothing. One explode + one distinct — the explode multiplier is
    the page's outlink count, and host pairs collapse before any
    downstream iteration."""
    src = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    out = (
        docs.select(
            F.nullif(src, F.lit("")).alias("src"),
            F.explode(F.col(links_col)).alias("__link"),
        )
        .select(
            "src",
            F.lower(
                F.try_parse_url(
                    # protocol-relative links ("//cdn.example/x") carry
                    # a host but no scheme, which try_parse_url rejects
                    # — normalize so they contribute edges instead of
                    # silently dropping
                    F.when(
                        F.col("__link").startswith("//"),
                        F.concat(F.lit("https:"), F.col("__link")),
                    ).otherwise(F.col("__link")),
                    F.lit("HOST"),
                )
            ).alias("dst"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("dst") != "")
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    return out


def extract_documents(resp: DataFrame, min_length: int = 1) -> DataFrame:
    """Response rows → the package's document shape ``(doc_id, url,
    fetch_time, length, text, title)``: keep HTTP 200 ``text/html``
    responses, extract text from the markup. Works over either WARC
    reader (:func:`read_warc`'s text scan or
    :func:`read_warc_binary`'s decode kernel) — the extraction is the
    same JVM projection either way."""
    text = html_to_text(F.col("html"))
    return (
        resp.filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
            # html must be DECODED payload: content_encoding is NULL
            # exactly when it is (identity-equivalents canonicalize to
            # NULL in both readers; the kernel nulls after decoding;
            # the text reader leaves real encodings applied —
            # compressed bytes are not a document)
            & F.col("content_encoding").isNull()
        )
        .select(
            "doc_id",
            "url",
            "fetch_time",
            F.length(text).alias("length"),
            text.alias("text"),
            html_title(F.col("html")).alias("title"),
        )
        .filter(F.length("text") >= min_length)
    )


def warc_documents(
    spark: SparkSession, path: str, min_length: int = 1
) -> DataFrame:
    """Raw WARC → the package's document shape ``(doc_id, url,
    fetch_time, length, text, title)``: keep HTTP 200 ``text/html``
    responses, extract text from the markup. Drop-in alternative to
    :func:`read_wet` when the crawl hasn't been pre-extracted —
    everything downstream (curation, dedup, DSIR, quality, packing)
    composes unchanged."""
    return extract_documents(read_warc(spark, path), min_length)


# Python-side mirrors of the JVM parse patterns, for the binary kernel
_CHARSET_RE = _re.compile(r"""charset=["']?([\w.-]+)""", _re.I)
_STATUS_RE = _re.compile(r"^HTTP/\d(?:\.\d)?\s+(\d{3})")


def read_warc_binary(
    spark: SparkSession, path: str, keep_http_headers: bool = False
) -> DataFrame:
    """The general-case WARC reader: ``binaryFile`` scan + an
    Arrow-batched ``mapInPandas`` kernel — for the payloads the text
    scan can't represent: ``Content-Encoding: gzip/deflate`` bodies
    (decompressed per record, stdlib zlib) and non-UTF-8 charsets
    (decoded per the HTTP ``Content-Type`` charset, ``errors=
    "replace"``). Same output schema as :func:`read_warc`; identity-
    encoded UTF-8 records come out identically from both readers
    (tested), so pipelines can pick per shard.

    This is the deliberate slow path (the multimodal module's decode-
    kernel pattern): per-FILE parallelism like any gzip scan, one
    Python/Arrow hop, whole file in executor memory — which is how
    Common Crawl shards anyway (~1 GiB). Undecodable payloads yield
    NULL ``html`` rather than killing the scan.

    ``content_encoding`` is NULL after a successful decode (the html
    value is plain text) — mirroring the text reader, where a
    non-identity value means "still compressed" and excludes the row
    from :func:`extract_documents`.

    Caveat vs :func:`read_warc`: a record with no WARC-Record-ID gets
    its md5 fallback id from the decoded, edge-stripped text in both
    readers — ids agree whenever the payload decodes; a payload this
    kernel cannot decode falls back to hashing the raw bytes."""
    schema = (
        "doc_id string, url string, fetch_time timestamp, "
        "http_status int, content_type string, charset string, "
        "content_encoding string, html string"
        + (", http_headers string" if keep_http_headers else "")
    )

    def kernel(batches):
        import gzip as _gz
        import hashlib
        import zlib

        import pandas as pd

        # Java regex \s is ASCII-only — Python str.strip() strips
        # Unicode whitespace (U+00A0, U+3000, ...) and would give this
        # reader different doc_ids/html than the text reader for
        # payloads with such edges
        ascii_ws = " \t\n\r\x0b\x0c"

        def parse_headers(block: bytes) -> dict:
            out = {}
            for line in block.split(b"\r\n"):
                k, sep, v = line.partition(b":")
                if sep:
                    out.setdefault(k.strip().lower(), v.strip())
            return out

        def decode_body(body: bytes, http: dict):
            enc = http.get(b"content-encoding", b"identity").lower()
            try:
                if enc in (b"gzip", b"x-gzip"):
                    body = _gz.decompress(body)
                elif enc == b"deflate":
                    try:
                        body = zlib.decompress(body)
                    except zlib.error:  # raw-deflate servers omit the header
                        body = zlib.decompress(body, -15)
                elif enc not in (b"identity", b"", b"none"):
                    # br, zstd, "gzip, identity" lists, ... — decoding
                    # compressed bytes as text would be mojibake, not
                    # the documented NULL-on-undecodable contract
                    return None, None
            except (OSError, zlib.error, EOFError):
                return None, None
            ctype = http.get(b"content-type", b"").decode("ascii", "replace")
            m = _CHARSET_RE.search(ctype)
            charset = m.group(1).strip("\"'").lower() if m else None
            try:
                return body.decode(charset or "utf-8", errors="replace"), charset
            except LookupError:  # unknown charset label
                return body.decode("utf-8", errors="replace"), charset

        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                data = bytes(data)
                if data[:2] == b"\x1f\x8b":  # whole-file gzip (multi-member ok)
                    data = _gz.decompress(data)
                for frag in data.split(b"\r\nWARC/1.0\r\n"):
                    frag = frag.removeprefix(b"WARC/1.0\r\n")
                    if not frag.strip():
                        continue
                    whdr_b, _, rest = frag.partition(b"\r\n\r\n")
                    whdr = parse_headers(whdr_b)
                    if whdr.get(b"warc-type", b"").lower() != b"response":
                        continue
                    # frame the HTTP block by the WARC Content-Length
                    # when it is sane: the record terminator's CRLFs
                    # follow the block, and blind rstrip would eat
                    # trailing payload bytes of COMPRESSED bodies that
                    # legitimately end in 0x0a/0x0d (~2/256 of valid
                    # gzip/deflate records — their checksum trailers
                    # are arbitrary bytes)
                    try:
                        cl = int(whdr.get(b"content-length", b""))
                    except ValueError:
                        cl = -1
                    if 0 <= cl <= len(rest):
                        rest_block = rest[:cl]
                    else:  # absent/garbage length: strip the at-most-
                        # two terminator CRLFs the record split leaves
                        rest_block = rest.removesuffix(b"\r\n").removesuffix(b"\r\n")
                    http_b, sep, body = rest_block.partition(b"\r\n\r\n")
                    if not sep:  # truncated record: headers only
                        http_b, body = rest_block, b""
                    http = parse_headers(http_b)
                    html, charset = decode_body(body, http)
                    status = _STATUS_RE.match(http_b.decode("ascii", "replace"))
                    rid = whdr.get(b"warc-record-id", b"").decode("ascii", "replace").strip("<>")
                    ctype = http.get(b"content-type")
                    rec = {
                        # decoded-text hash matches the text reader's
                        # fallback; raw bytes only when undecodable
                        "doc_id": rid or hashlib.md5(
                            html.strip(ascii_ws).encode()
                            if html is not None
                            else body
                        ).hexdigest(),
                        "url": whdr.get(b"warc-target-uri", b"").decode("utf-8", "replace") or None,
                        "fetch_time": whdr.get(b"warc-date", b"").decode("ascii", "replace") or None,
                        "http_status": int(status.group(1)) if status else None,
                        "content_type": (
                            ctype.split(b";", 1)[0].strip().lower().decode("ascii", "replace")
                            if ctype else None
                        ),
                        "charset": charset,
                        # NULL = the html value is decoded text; the
                        # undecodable case keeps the header value so
                        # the row is auditable
                        "content_encoding": (
                            None
                            if html is not None
                            else http.get(b"content-encoding", b"").decode("ascii", "replace") or None
                        ),
                        "html": html.strip(ascii_ws) if html is not None else None,
                    }
                    if keep_http_headers:
                        rec["http_headers"] = http_b.decode("utf-8", "replace")
                    rows.append(rec)
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "url", "fetch_time", "http_status",
                    "content_type", "charset", "content_encoding", "html",
                ] + (["http_headers"] if keep_http_headers else []),
            )
            # tz-AWARE µs: a naive series would be reinterpreted in the
            # session timezone by the Arrow bridge (wrong instants off
            # UTC hosts); NANOS would be rejected — hence [us, UTC]
            out["fetch_time"] = pd.to_datetime(
                out["fetch_time"], errors="coerce", utc=True
            ).astype("datetime64[us, UTC]")
            out["http_status"] = out["http_status"].astype("Int32")
            yield out

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(kernel, schema)


# Bundled verbatim snapshot of the (public, MPL-2.0) Mozilla Public
# Suffix List — publicsuffix.org/list/public_suffix_list.dat, dated
# snapshot 2023-02-09 (Debian publicsuffix 20230209.2326; the MPL
# header rides inside the file itself). Parsed lazily, ICANN section
# by default; ``include_private=True`` adds the PRIVATE section
# (github.io-style operator suffixes). Replaces the hand-curated
# subset of rounds 8–9 — the full list covers it outright.
_PSL_SNAPSHOT_DATE = "2023-02-09"
_PSL_DATA_FILE = "data/public_suffix_list.dat"
_psl_rows_cache: dict[bool, list] = {}


def _bundled_psl_rows(include_private: bool) -> list:
    """(suffix, labels, kind) rows parsed from the packaged snapshot,
    cached per process — the file is ~240 KB / ~9.5k rules, so the
    parse is driver-trivial and never worth a Spark job."""
    if include_private not in _psl_rows_cache:
        import os

        path = os.path.join(os.path.dirname(__file__), _PSL_DATA_FILE)
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        if not include_private:
            text = text.split("===BEGIN PRIVATE DOMAINS===", 1)[0]
        _psl_rows_cache[include_private] = _parse_psl_rows(text)
    return _psl_rows_cache[include_private]


def _parse_psl_rows(text: str) -> list:
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0].lower()
        if line.startswith("!"):
            kind, s = "exception", line[1:]
        elif line.startswith("*."):
            kind, s = "wildcard", line[2:]
        else:
            kind, s = "rule", line
        if s:
            rows.append((s, s.count(".") + 1, kind))
    return rows


def psl_table(spark: SparkSession, include_private: bool = False) -> DataFrame:
    """The COMPLETE bundled Mozilla Public Suffix List (verbatim
    snapshot %s) as a DataFrame: ``suffix``, its label count, and the
    rule ``kind`` (``rule`` | ``wildcard`` | ``exception`` —
    wildcard/exception rows store the part after the ``*.``/``!``
    marker). ICANN section by default (~7.4k rules, 8 distinct
    (labels, kind) shapes); ``include_private=True`` adds the PRIVATE
    section (github.io-style operator suffixes — use it when
    per-domain caps should treat each operator subdomain as its own
    registrable domain). Tiny either way — always the broadcast side
    of the domain join. A newer list file swaps in via
    :func:`parse_psl_text`.

    Caveat the list itself imposes: IDN entries are unicode-only, so
    punycode (``xn--``) hosts fall through to the 2-label fallback
    unless the caller pre-decodes hosts or augments the dim with
    punycode twins.""" % _PSL_SNAPSHOT_DATE
    return spark.createDataFrame(
        _bundled_psl_rows(include_private),
        "suffix string, labels int, kind string",
    )


def parse_psl_text(spark: SparkSession, text: str) -> DataFrame:
    """Build the :func:`psl_table` shape from a RAW Mozilla list
    file (https://publicsuffix.org/list/public_suffix_list.dat): skip
    blank/comment lines, classify ``!``-prefixed lines as exception
    rules and ``*.``-prefixed lines as wildcard rules, everything else
    plain — the newer-snapshot swap-in path (both ICANN and PRIVATE
    sections are kept; pre-split on the section marker to drop one).
    Per the published format, anything after the first whitespace on a
    line is ignored and a rule's wildcard appears only as the leading
    label. Unicode entries are kept verbatim (hosts compare
    lowercased; punycode hosts need punycode twin entries, which the
    published file does NOT carry — see :func:`psl_table`)."""
    return spark.createDataFrame(
        _parse_psl_rows(text), "suffix string, labels int, kind string"
    )


def with_url_parts(
    df: DataFrame,
    url_col: str = "url",
    domain_mode: str = "heuristic",
    psl: DataFrame | None = None,
) -> DataFrame:
    """Add ``host``, ``domain``, ``path`` and ``url_canonical`` — the
    crawl pipeline's URL normalization (RefinedWeb/CCNet run URL-level
    dedup before any content pass). Canonicalization: lowercase
    scheme+host, strip the fragment, drop tracking query params
    (utm_*, fbclid, gclid, ref), drop a trailing "/" — all JVM
    ``parse_url``/regex, no UDF.

    ``domain_mode``:

    * ``"heuristic"`` (default, zero-dependency): last two host labels.
      Wrong for multi-label public suffixes ("example.co.uk" →
      "co.uk"), which under-caps UK/AU/JP sites in per-domain caps.
    * ``"psl"``: public-suffix-list lookup via one broadcast left
      join per rule shape in the ``psl`` dim (default
      :func:`psl_table`); the registrable domain follows the
      publicsuffix.org algorithm — EXCEPTION rules win outright (the
      domain is the exception's own labels), else the longest
      effective suffix (a wildcard ``*.ck`` rule's effective suffix is
      its stored part plus the matched label), else the two-label
      fallback for unlisted TLDs. A host with no labels left of its
      public suffix (the host IS a public suffix) gets a NULL domain.
      No shuffle of ``df`` — every join broadcasts the tiny suffix
      side; the only driver work is a distinct over the dim's
      (labels, kind) pairs (≤ a dozen values for the full Mozilla
      list) to shape the join plan."""
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
    out = (
        df.withColumn("host", host)
        .withColumn("path", path_norm)
        .withColumn(
            "url_canonical",
            F.when(host.isNull() | (host == ""), u).otherwise(canonical),
        )
    )

    def last_labels(k: int) -> F.Column:
        # last k dot-separated labels of host; NULL when host has
        # fewer than k labels (nullif — '' must not become a domain)
        return F.nullif(
            F.regexp_extract(
                F.col("host"), r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1), 1
            ),
            F.lit(""),
        )

    if domain_mode == "heuristic":
        return out.withColumn(
            "domain", F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1)
        )
    if domain_mode != "psl":
        raise ValueError(f"domain_mode must be 'heuristic' or 'psl', got {domain_mode!r}")

    if psl is None:
        psl = psl_table(df.sparkSession)
    if "kind" not in psl.columns:  # legacy plain-rule-only dim shape
        psl = psl.withColumn("kind", F.lit("rule"))
    # The dim's distinct (labels, kind) pairs decide the join plan — a
    # bounded driver-side collect over the TINY suffix dim (≤ a dozen
    # shapes even for the full Mozilla list), never the corpus.
    shapes = sorted(
        (int(r["labels"]), r["kind"])
        for r in psl.select("labels", "kind").distinct().collect()
        if r["kind"] in ("rule", "wildcard", "exception") and r["labels"]
    )
    joined = out
    flags: list[tuple[int, str, str]] = []
    for k, kind in shapes:
        flag = f"__psl_{kind}_{k}"
        side = F.broadcast(
            psl.filter((F.col("labels") == k) & (F.col("kind") == kind))
            .select(F.col("suffix").alias(flag))
            .distinct()
        )
        joined = joined.join(side, last_labels(k) == F.col(flag), "left")
        flags.append((k, kind, flag))

    # publicsuffix.org precedence: exception rules beat everything
    # (the registrable domain IS the exception's own labels); among
    # the rest the LONGEST effective suffix wins — a wildcard rule's
    # effective suffix is its stored part + the matched label (k+1)
    def _eff(k: int, kind: str) -> int:
        return k + 1 if kind == "wildcard" else k

    ordered = sorted(flags, key=lambda t: (t[1] != "exception", -_eff(t[0], t[1])))
    domain = None
    for k, kind, flag in ordered:
        hit = F.col(flag).isNotNull()
        dom = last_labels(k) if kind == "exception" else last_labels(_eff(k, kind) + 1)
        domain = F.when(hit, dom) if domain is None else domain.when(hit, dom)
    fallback = F.regexp_extract(F.col("host"), r"([^.]+\.[^.]+)$", 1)
    domain = fallback if domain is None else domain.otherwise(fallback)
    return joined.withColumn("domain", domain).drop(*[f for _, _, f in flags])


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = "fetch_time",
) -> DataFrame:
    """URL-level dedup: one row per canonical URL — keep the LATEST
    fetch when ``order_col`` is given (ties broken deterministically),
    else an arbitrary-but-deterministic min. One shuffle on the
    canonical URL; runs before any content-level pass because it
    needs no text comparison at all.

    Rows with a NULL or empty canonical URL pass through UNDEDUPED
    (the same discipline ``cap_per_group`` applies to NULL groups):
    "no URL" is missing information, not a shared identity, and
    collapsing all URI-less records to one survivor is silent corpus
    loss (round-6 finding). Implementation: URL-less rows get a
    row-unique group key instead of being split off and unioned back
    — one scan and one shuffle over the corpus either way, where the
    filter+union form scans it twice (the NUL bytes in the synthetic
    key cannot appear in a real URL)."""
    from binancedatapipeline_spark.operators.dedup import dedup_keep_last

    tmp = with_url_parts(df, url_col)
    no_url = F.col("url_canonical").isNull() | (F.col("url_canonical") == "")
    # monotonically_increasing_id() is NONDETERMINISTIC across task
    # retries (partition re-assignment changes the ids). Harmless here
    # because the id's VALUE never matters — each URL-less row only
    # needs a key no other row shares, and any assignment gives that —
    # but do not copy this pattern anywhere the key is joined against,
    # persisted, or compared across computations of the same input.
    grp = F.when(
        no_url,
        F.concat(
            F.lit("\x00nourl\x00"),
            F.monotonically_increasing_id().cast("string"),
        ),
    ).otherwise(F.col("url_canonical"))
    tmp = tmp.withColumn("__grp", grp)
    if order_col is not None:
        out = dedup_keep_last(tmp, ["__grp"], order_col)
    else:
        w = Window.partitionBy("__grp").orderBy(F.col(url_col).asc())
        out = (
            tmp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out.drop("host", "domain", "path", "url_canonical", "__grp")


def parse_blocklist_text(
    spark: SparkSession, text: str, category: str | None = None
) -> DataFrame:
    """Build a blocklist dim (``domain``) from a raw one-domain-per-
    line file — the UT1/adult-list format RefinedWeb's URL filter
    consumes: blank lines and ``#``/``//`` comments skipped, entries
    lowercased, anything after the first whitespace ignored. Leading
    ``www.`` is NOT stripped: an entry blocks its own host and every
    subdomain, so list authors who mean the whole site publish the
    registrable domain.

    ``category`` stamps every row with the list's name (UT1 publishes
    one file per category — adult, gambling, phishing...), so several
    parsed lists union into one dim and
    :func:`with_blocked_domain`'s ``category_col`` attributes each
    blocked row to the list(s) that fired."""
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or line.startswith("//"):
            continue
        dom = line.split()[0].lower().strip(".")
        if dom:
            rows.append((dom,) if category is None else (dom, category))
    schema = "domain string" if category is None else "domain string, category string"
    if rows and len(rows) <= 10_000:
        # Inline-VALUES LocalRelation for list-sized dims: a
        # parallelize()-backed dim re-pickles its rows through a
        # Python worker on EVERY evaluation, and with_blocked_domain
        # evaluates the dim lineage once per label shape (one
        # broadcast build each) plus once for the shapes probe — the
        # Python round trips, not the corpus, dominated the
        # blocklist_domains bench row. A LocalRelation evaluates
        # driver-side (LocalTableScan): the shapes collect runs zero
        # jobs and each broadcast build is a JVM-only tiny aggregate.
        def lit(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        if category is None:
            vals = ", ".join(f"({lit(d)})" for (d,) in rows)
            return spark.sql(f"SELECT * FROM VALUES {vals} AS t(domain)")
        vals = ", ".join(f"({lit(d)}, {lit(c)})" for d, c in rows)
        return spark.sql(f"SELECT * FROM VALUES {vals} AS t(domain, category)")
    if not rows:
        return spark.createDataFrame([], schema)
    # big lists: size the slice count to the list, don't default to one
    # slice per core: a bare createDataFrame parallelizes even a 2-row
    # list over defaultParallelism slices, and every slice is a
    # Python-worker round trip — three small lists unioned made
    # 96-task dim stages, and a coalesce(1) over them was WORSE (one
    # task draining all 96 pickled slices sequentially, ~16 s for six
    # rows). ~50k rows per slice keeps even a 4M-entry UT1 list
    # reasonably parallel.
    n_slices = max(1, min(len(rows) // 50_000 + 1, 32))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )


def with_blocked_domain(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    domain_col: str = "domain",
    output_col: str = "blocked_domain",
    category_col: str | None = None,
    output_category_col: str = "blocked_category",
    broadcast: bool = True,
    host_dim: DataFrame | None = None,
) -> DataFrame:
    """Add ``output_col``: the blocklist entry the row's host falls
    under (host == entry, or host ends with ``"." + entry`` — i.e.
    every subdomain of a listed domain is blocked, the UT1/RefinedWeb
    convention), NULL when no entry matches. The LONGEST matching
    entry wins, so an audit row shows the most specific listing.

    ``category_col`` (a column of ``blocklist``, e.g. from
    :func:`parse_blocklist_text`'s ``category``) additionally emits
    ``output_category_col``: the matched entry's category — a domain
    listed under several categories yields them comma-joined in
    sorted order (the dim side pre-aggregates per domain, so the
    corpus join multiplicity stays exactly 1).

    Scale shape, ``broadcast=True`` (default): the corpus NEVER
    shuffles. Like the PSL domain join, the blocklist's distinct
    label counts (a bounded driver collect over the tiny dim — UT1
    lists hold 2–5-label entries) decide the plan: one broadcast LEFT
    join per label count, keyed on the last k labels of the host
    (pure regex, no explode). A 4M-entry list is a few hundred MB
    broadcast once.

    ``broadcast=False`` is the beyond-broadcast escape hatch (the
    same ``method=`` discipline as DSIR's join scorer and the spans
    probe): for merged multi-category lists past ~10M entries, the
    broadcast relations stop fitting executor/driver memory. The
    fallback joins DISTINCT HOSTS — never the corpus rows — against
    the list: distinct hosts (one narrow-column shuffle), explode
    each host's ≤ |label shapes| candidate suffixes, shuffle-join the
    per-domain aggregated list, keep the longest hit per host
    (``max_by`` on label count — no window), then one host-keyed
    shuffle join back onto the corpus. Cost shape vs the default: the
    corpus is read twice (the host-distinct lineage prunes to the one
    host/url column; the final join reads the full rows) and shuffles
    once on host — the price of never building the list broadcast.
    Both paths return identical results (randomized differential in
    tests/test_corpus_io.py).

    ``host_dim`` (fallback path only) makes that a ONE-corpus-read
    plan: a one-column relation of every host appearing in ``df`` —
    the host dimension a warehouse deployment already maintains, or
    the output of a prior ``with_url_parts`` materialization — is
    probed against the list INSTEAD of re-deriving distinct hosts
    from the corpus, so the corpus is scanned exactly once (the final
    host-keyed join). Hosts are normalized the same way (lowercase,
    root-dot strip, distinct), so a raw un-deduped column relation is
    fine. CONTRACT: a corpus host missing from ``host_dim`` is
    silently NOT blocked — completeness is the caller's promise.
    Ignored under ``broadcast=True`` (that plan already reads the
    corpus once and never builds a host relation at all).

    ``host_col`` skips URL parsing when the host was already extracted
    (e.g. by :func:`with_url_parts`); hosts compare lowercased; rows
    with a NULL/empty host are never blocked (missing information is
    not a match)."""
    if host_col is None:
        host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    else:
        host = F.lower(F.col(host_col))
    # strip the DNS root dot: "a.bad.com." is the same host as
    # "a.bad.com", and the label-suffix regex below can't match past a
    # trailing dot — an unstripped FQDN form would evade the list
    host = F.regexp_replace(host, r"\.+$", "")
    out = df.withColumn("__bl_host", F.nullif(host, F.lit("")))
    has_cat = category_col is not None
    cols = [F.lower(F.col(domain_col)).alias("__bl_dom")]
    if has_cat:
        cols.append(F.col(category_col).alias("__bl_cat"))
    bl = (
        blocklist.select(*cols)
        .filter(F.col("__bl_dom").isNotNull() & (F.col("__bl_dom") != ""))
        .withColumn(
            "__bl_labels",
            F.size(F.split(F.col("__bl_dom"), r"\.")),
        )
    )
    shapes = sorted(
        int(r["__bl_labels"]) for r in bl.select("__bl_labels").distinct().collect()
    )

    def last_labels(k: int) -> F.Column:
        # last k dot-separated labels of the host; NULL when the host
        # has fewer than k labels (same kernel as the PSL join)
        return F.nullif(
            F.regexp_extract(
                F.col("__bl_host"), r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1), 1
            ),
            F.lit(""),
        )

    if not broadcast:
        if not shapes:
            out = out.withColumn(output_col, F.lit(None).cast("string"))
            if has_cat:
                out = out.withColumn(
                    output_category_col, F.lit(None).cast("string")
                )
            return out.drop("__bl_host")
        if host_dim is not None:
            # the one-corpus-read plan: probe the caller's host
            # dimension (normalized identically — a raw un-deduped
            # column is fine) instead of re-deriving hosts from the
            # corpus; the only corpus scan left is the final join
            hosts = (
                host_dim.select(
                    F.nullif(
                        F.regexp_replace(
                            F.lower(F.col(host_dim.columns[0])), r"\.+$", ""
                        ),
                        F.lit(""),
                    ).alias("__bl_host")
                )
                .filter(F.col("__bl_host").isNotNull())
                .distinct()
            )
        else:
            # distinct HOSTS — one narrow-column shuffle — not corpus rows
            hosts = (
                out.select("__bl_host")
                .filter(F.col("__bl_host").isNotNull())
                .distinct()
            )
        cand = (
            hosts.select(
                "__bl_host",
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(k).alias("__bl_k"),
                            last_labels(k).alias("__bl_sfx"),
                        )
                        for k in shapes
                    ])
                ).alias("__bl_c"),
            )
            .select(
                "__bl_host",
                F.col("__bl_c.__bl_k").alias("__bl_k"),
                F.col("__bl_c.__bl_sfx").alias("__bl_sfx"),
            )
            .filter(F.col("__bl_sfx").isNotNull())
        )
        # one row per listed domain (same multiplicity-1 contract as
        # the per-k broadcast sides); a k-label suffix only ever
        # equals a k-label domain, so the string is the whole key
        if has_cat:
            dim = bl.groupBy(F.col("__bl_dom")).agg(
                F.array_join(
                    F.array_sort(F.collect_set("__bl_cat")), ","
                ).alias("__bl_catj")
            )
        else:
            dim = bl.select("__bl_dom").distinct()
        hit_rows = cand.join(dim, cand["__bl_sfx"] == dim["__bl_dom"])
        # longest entry wins = max label count; per (host, k) the
        # suffix is unique so max_by has no ties to break
        win_val = (
            F.struct(
                F.col("__bl_dom").alias("d"), F.col("__bl_catj").alias("c")
            )
            if has_cat
            else F.struct(F.col("__bl_dom").alias("d"))
        )
        winners = (
            hit_rows.groupBy("__bl_host")
            .agg(F.max_by(win_val, F.col("__bl_k")).alias("__bl_win"))
        )
        win_cols = ["__bl_host", F.col("__bl_win.d").alias(output_col)]
        if has_cat:
            win_cols.append(
                F.nullif(F.col("__bl_win.c"), F.lit("")).alias(
                    output_category_col
                )
            )
        return out.join(
            winners.select(*win_cols), "__bl_host", "left"
        ).drop("__bl_host")

    joined = out
    flags: list[tuple[int, str]] = []
    for k in shapes:
        flag = f"__bl_hit_{k}"
        grp = bl.filter(F.col("__bl_labels") == k)
        if has_cat:
            # ONE row per domain no matter how many category lists
            # carry it — the corpus join multiplicity must stay 1
            side = grp.groupBy(F.col("__bl_dom").alias(flag)).agg(
                F.array_join(
                    F.array_sort(F.collect_set("__bl_cat")), ","
                ).alias(f"{flag}_cat")
            )
        else:
            side = grp.select(F.col("__bl_dom").alias(flag)).distinct()
        joined = joined.join(
            F.broadcast(side), last_labels(k) == F.col(flag), "left"
        )
        flags.append((k, flag))
    ordered = [flag for _, flag in sorted(flags, reverse=True)]
    blocked = (
        F.coalesce(*[F.col(f) for f in ordered])
        if flags
        else F.lit(None).cast("string")
    )
    drop_cols = ["__bl_host", *ordered]
    joined = joined.withColumn(output_col, blocked)
    if has_cat:
        # the category must come from the SAME (longest) entry that
        # won output_col: a chained WHEN stops at the first non-null
        # FLAG — a coalesce over the categories would fall through to
        # a shorter entry whenever the winner's category is NULL
        hit = F.lit(None).cast("string")
        for f in ordered:
            cond = F.col(f).isNotNull()
            val = F.nullif(F.col(f"{f}_cat"), F.lit(""))
            hit = F.when(cond, val) if f == ordered[0] else hit.when(cond, val)
        joined = joined.withColumn(output_category_col, hit)
        drop_cols += [f"{f}_cat" for f in ordered]
    return joined.drop(*drop_cols)


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    domain_col: str = "domain",
    category_col: str | None = None,
) -> DataFrame:
    """Drop every row whose host is a listed domain or any subdomain
    of one — the crawl-curation URL filter (RefinedWeb runs it before
    any content pass; UT1-style category lists are the usual input).
    Schema passes through unchanged (``category_col`` is accepted so
    one kwargs dict drives both this and the audit form — dropped
    rows need no attribution, so the category never materializes in
    the output). For auditing which entry/category blocked a row, use
    :func:`with_blocked_domain` directly."""
    return (
        with_blocked_domain(
            df, blocklist, url_col, host_col, domain_col,
            category_col=category_col,
        )
        .filter(F.col("blocked_domain").isNull())
        .drop("blocked_domain", "blocked_category")
    )

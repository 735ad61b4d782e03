"""Trained character-n-gram language identification (Cavnar &
Trenkle 1994, "N-Gram-Based Text Categorization" — the classic
profile-ranking method behind most pre-neural language filters).

The curation pipeline's language stage in two halves, both
distributed and both pure DataFrame ops:

1. **Train** — per-language profiles: the ``top_k`` most frequent
   character n-grams of a labeled corpus, ranked. One explode + one
   (lang, gram) groupBy + one per-lang rank window; the profile
   relation is ≤ ``languages × top_k`` rows — broadcastable by
   construction, like every fitted table in this package (SQ/PQ
   codebooks, DSIR ratios, the unigram LM).
2. **Classify** — per-document out-of-place distance against every
   profile: explode the document's ranked grams, broadcast-join the
   profile table, and fold ``|doc_rank − profile_rank|`` per language
   (``miss_penalty`` for grams absent from a profile) in ONE
   groupBy(doc) with per-language conditional aggregates — the whole
   profile relation is collected driver-side first and planned as a
   literal local relation (it is bounded by construction, same
   discipline as the SQ codebook collect), so its lineage evaluates
   exactly once. One corpus scan, one shuffle, no window, no cross
   join; the argmin is a row-local ``array_min`` over per-language
   structs.

Scale shape at 100 TB: the corpus is touched once per half; nothing
ever materializes per-language corpora; the only joined relation is
the ≤ few-thousand-row profile dim (broadcast). Next to
:func:`textops.analysis.with_lang_guess` (the zero-fit stopword
heuristic, one scan, no shuffle): train this on labeled data when you
have it, fall back to the heuristic when you don't.

The reference pipeline has no language machinery; this extends the
training-data suite per the brief (langid is the first gate of
CCNet-style curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOP_K = 300
DEFAULT_N = (2, 3)  # char bigrams + trigrams


def _padded(col) -> F.Column:
    """Lowercase, collapse whitespace runs to one space, edge-trim,
    then pad with one leading/trailing space (the Cavnar–Trenkle
    convention: word edges produce edge-grams). Edge-trim BEFORE
    padding so whitespace-only/empty text becomes exactly ``"  "``
    (detectable: no grams) — bare padding would manufacture a ``"  "``
    bigram and every such document would all-miss-tie to the
    alphabetically first language instead of classifying to NULL."""
    base = F.regexp_replace(
        F.regexp_replace(F.lower(col), r"\s+", " "), r"^ | $", ""
    )
    return F.concat(F.lit(" "), base, F.lit(" "))


def _grams_from_chars(chars, n_values=DEFAULT_N) -> F.Column:
    """N-gram array from a BOUND char-array value (a lambda variable
    or column attribute).

    Two measured O(len²)-per-document traps shape this form:
    1. Spark's higher-order functions are interpreted — every
       subexpression in a lambda body is re-evaluated PER ELEMENT, so
       the input must be a bound value, never an inline
       normalize-and-pad expression tree (regexes per gram).
    2. ``substring(s, i, n)`` is itself O(i) on UTF-8 strings (the
       codepoint offset is found by scanning), so POSITIONAL gram
       extraction is quadratic even over a bound string — indexing a
       pre-split char array (`element_at`/`slice`: O(1) per element)
       is the linear form. Measured on one 100 KB row: 57 s
       (substring over a bound string) → 3.4 s (char array).

    Short/empty texts guard the descending-``sequence(1, 0)`` trap
    with an explicit empty array; size 2 (the bare padding of an
    empty source) yields no grams."""

    def one_n(n: int):
        # helper scope, not a loop-closure: F.transform dispatches on
        # the lambda's ARITY, so a `lambda i, _n=n` default-arg trick
        # would be mistaken for the (element, index) binary form
        if n == 2:  # the hot default: two O(1) lookups beat slice+join
            def body(i):
                return F.concat(
                    F.element_at(chars, i),
                    F.element_at(chars, (i + F.lit(1)).cast("int")),
                )
        else:
            def body(i):
                return F.array_join(F.slice(chars, i, n), "")

        return F.when(
            (F.size(chars) > 2) & (F.size(chars) >= n),
            F.transform(
                F.sequence(F.lit(1), F.size(chars) - F.lit(n - 1)), body
            ),
        ).otherwise(F.array().cast("array<string>"))

    parts = [one_n(n) for n in n_values]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.concat(grams, p)
    return grams


def char_ngrams(col, n_values=DEFAULT_N):
    """The document's character n-gram array (lowercased, whitespace
    runs collapsed to one space, text padded with a leading/trailing
    space so word edges produce edge-grams — the Cavnar–Trenkle
    convention). Pure JVM expressions, no explode here, no shuffle.

    Extraction is ONE native ``regexp_extract_all`` per n — a
    zero-width lookahead ``(?s)(?=(..))`` captures every overlapping
    n-gram in a single codegen'd expression, replacing the round-8
    interpreted higher-order-function walk (split to a char array +
    ``transform`` with a per-element expression-tree evaluation —
    correct and linear, but the interpreter overhead per gram
    dominated the langid bench rows). ``(?s)`` keeps ``.`` matching
    the line/paragraph separators ASCII ``\\s+`` collapsing leaves
    behind. One measured exception keeps the HOF form alive: after a
    zero-length lookahead match, ``Matcher.find`` advances by UTF-16
    CODE UNIT, so a document containing supplementary-plane code
    points (emoji) would gram at lone-surrogate positions — those
    rows (detected by one native ``rlike`` over the supplementary
    range) take the HOF branch instead, whose char-array ``split``
    walks true code points. Gram multiset therefore identical to the
    round-8 form on every input (differential-pinned in
    tests/test_langid.py, including U+2028 and astral-plane code
    points)."""
    padded = _padded(col)
    parts = [
        F.regexp_extract_all(padded, F.lit("(?s)(?=(" + "." * n + "))"), 1)
        for n in n_values
    ]
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    hof = F.transform(
        F.array(F.split(padded, "")),
        lambda ch: _grams_from_chars(ch, n_values),
    )[0]
    # the >2 guard mirrors _grams_from_chars: a whitespace-only/empty
    # source pads to exactly "  ", which must yield NO grams (the
    # lookahead would otherwise manufacture a "  " bigram)
    return F.when(
        padded.rlike("[\\x{10000}-\\x{10FFFF}]"), hof
    ).otherwise(
        F.when(F.length(padded) > 2, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def char_ngrams_hof(col, n_values=DEFAULT_N):
    """The round-8 higher-order-function form of :func:`char_ngrams`
    (char-array split + bound-value ``transform``): kept as the
    differential reference for the regex extraction — same gram
    multiset on every input, including the empty/whitespace edge and
    non-BMP code points."""
    return F.transform(
        F.array(F.split(_padded(col), "")),
        lambda ch: _grams_from_chars(ch, n_values),
    )[0]


def _row_top_grams(grams_col, top_k: int) -> F.Column:
    """``struct(gram, n)`` array of the row's ``top_k`` most frequent
    grams, ranked exactly like the profile fit (count desc, gram asc)
    — computed INSIDE the row: sort the gram array, run-length encode
    it (run starts → ``zip_with`` next-start for counts), comparator-
    sort the runs, slice ``top_k``. Nothing leaves the row but the
    bounded top-k array, so building a document profile costs ZERO
    shuffles — where the groupBy+rank-window form shuffled every gram
    of every document twice. All inputs are bound as lambda variables
    (the round-8 interpreted-lambda lesson)."""
    return F.transform(
        F.array(F.array_sort(grams_col)),
        lambda sg: F.when(
            F.size(sg) > 0,
            _runs_top_k(sg, top_k),
        ).otherwise(
            F.array().cast("array<struct<gram:string,n:int>>")
        ),
    )[0]


def _runs_top_k(sg, top_k: int) -> F.Column:
    """Run-length + top-k over a BOUND sorted gram array (non-empty).

    The run-start index array is itself BOUND (one more
    ``transform(array(...))`` nesting, round 11) before the
    ends/counts are derived from it: the former form instantiated the
    O(n)-interpreted start-index filter THREE times in one expression
    tree (once as ``starts``, twice more inside ``ends``'s slice/size)
    — the interpreter re-evaluated the whole filter each time, and
    that filter is the per-row hot spot (n = grams per document).
    Binding it evaluates it exactly once per row (paired A/B at
    sf0.1: classify 1.47 s → 1.35 s, ~7% — smaller than the 3×
    instantiation suggests because interpreted subexpression
    elimination already deduplicates part of the tree; identical
    output — same expressions, one evaluation)."""
    starts = F.filter(
        F.sequence(F.lit(1), F.size(sg)),
        lambda i: (i == 1)
        | (F.element_at(sg, i.cast("int"))
           != F.element_at(sg, (i - 1).cast("int"))),
    )

    # encode the (count desc, gram asc) order as a NATIVE struct sort:
    # struct ordering is field-by-field ascending, so sorting
    # (−n, gram) structs with the default comparator is the same total
    # order as the former lambda comparator — which the interpreter
    # invoked per COMPARISON (O(k log k) expression-tree evaluations
    # per document, the hot spot of the row-local profile). The
    # slice-then-rebuild keeps the public (gram, n) field shape.
    def runs_of(st):
        ends = F.concat(
            F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
            F.array(F.size(sg) + 1),
        )
        return F.zip_with(
            st,
            ends,
            lambda s, e: F.struct(
                (s - e).cast("int").alias("nn"),
                F.element_at(sg, s.cast("int")).alias("gram"),
            ),
        )

    runs = F.transform(F.array(starts), runs_of)[0]
    return F.transform(
        F.slice(F.array_sort(runs), 1, top_k),
        lambda r: F.struct(
            r["gram"].alias("gram"), (-r["nn"]).cast("int").alias("n")
        ),
    )


def train_language_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
) -> DataFrame:
    """``(lang, gram, rank)``: each language's ``top_k`` most frequent
    character n-grams, 1-ranked by count (gram string breaks ties, so
    training is deterministic under any row order). ≤ ``languages ×
    top_k`` rows — the broadcastable fit relation."""
    counts = (
        df.select(lang_col, F.explode(char_ngrams(F.col(text_col), n_values)).alias("gram"))
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("n").desc(), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col(lang_col).alias("lang"), "gram", "rank")
    )


def collect_profiles(profiles) -> list:
    """Materialize a fitted profile relation to local ``(lang, gram,
    rank)`` rows — the pre-collected form every classify entry point
    accepts in place of the DataFrame. Collect ONCE and reuse when the
    same fit drives many classify calls (the streaming curation sink:
    a DataFrame profile handed to ``curate(lang_profiles=...)`` inside
    ``foreachBatch`` would re-run its whole training lineage — a
    corpus-wide aggregation — on EVERY micro-batch; the collected rows
    are a bounded dim, ≤ languages × top_k). A list passes through
    unchanged, so callers can normalize unconditionally."""
    if isinstance(profiles, DataFrame):
        return [
            (r["lang"], r["gram"], int(r["rank"]))
            for r in profiles.select("lang", "gram", "rank").collect()
            if r["lang"] is not None
        ]
    return [(lang, gram, int(rank)) for lang, gram, rank in profiles]


def classify_language_scores(
    df: DataFrame,
    profiles: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
    miss_penalty: int | None = None,
    output_col: str = "lang_id",
    max_chars: int | None = 4000,
) -> DataFrame:
    """The score relation behind :func:`classify_language`:
    ``(id_col, output_col, output_col_dist)`` with exactly ONE row per
    distinct non-NULL ``id_col`` of ``df`` — including documents that
    produce no n-grams (classified NULL with NULL distance, same
    convention as the joined form).

    This is the whole classification when the caller only needs the
    per-document verdict (the registry's ``doc_langid`` query): the
    round-11 measurement showed :func:`classify_language`'s
    re-attaching left join costing a second corpus scan, a round-robin
    + hash exchange of the id column and a SortMergeJoin with two
    sorts — none of which the verdict needs (guide §2.4: remove
    shuffles outright). Zero-gram documents stay representable because
    the explode is ``posexplode_outer``: an empty top-k array emits one
    NULL-gram row, the profile join misses it, and the argmin is
    guarded by ``__dg > 0`` so those ids surface with NULL lang/dist
    instead of an all-miss tie. Everything else (gram kernel, distance
    fold, argmin) is byte-identical to the joined form.

    ``output_col`` is the language whose profile is nearest to
    the document's own ranked n-gram profile by out-of-place distance
    (``Σ |doc_rank − profile_rank|``, ``miss_penalty`` — default
    ``top_k`` — for document grams a profile lacks). NULL for
    documents that produce no n-grams. Deterministic: equal distances
    break toward the alphabetically first language.

    The document profile is capped at ``top_k`` grams like the
    training side (the method's own normalization — long documents
    must not out-vote the profile length), and ``max_chars`` bounds
    the gram extraction to the document HEAD (the CCNet deployment —
    language rarely changes mid-page, and 4k characters carry far
    more than ``top_k`` distinct grams): the per-document explode
    cost is a constant, not a function of document length, which is
    the difference between a bounded and an unbounded shuffle at
    100 TB. ``max_chars=None`` reads everything.

    Plan shape (the round-9 replan): the WHOLE profile relation is
    collected driver-side up front — it is a bounded fitted dim
    (≤ languages × top_k rows) by construction, the same
    bounded-collect discipline as the SQ codebook and the DSIR
    literal-array fit — so its lineage (often a full training
    aggregation) evaluates exactly once per call, the broadcast side
    is a local relation, and the language list falls out for free.
    That lets the whole score fold into ONE ``groupBy(doc)`` with
    per-language conditional aggregates and a row-local ``array_min``
    argmin. The expensive per-row gram top-k is therefore evaluated
    exactly ONCE (the round-8 form fed it to two join branches, and
    Catalyst does not dedupe common subtrees across branches — the
    corpus was scanned and the top-k computed twice), and the shuffle
    count drops from three (distance fold + argmin window + size×lang
    join) to one. Sizing note, MEASURED (round 10,
    ``tools/bench_langid.py --many-langs``): the fold carries 2
    aggregate columns per language, and on Spark 4.1 the aggregate
    runs OUTSIDE whole-stage codegen at every language count tried
    (10/40/60/80 — the plan's HashAggregates carry no codegen stage
    marker even well under ``codegen.maxFields``), so there is no
    cliff to fall off: end-to-end wall is FLAT in language count
    (19.1 s at 10 langs → 20.7 s at 80 langs, 20k docs × 2k chars —
    +8% for 8× languages, accuracy 1.0 on held-out synthetic docs at
    60). The cost lives in the per-row gram top-k (interpreted
    higher-order array functions), not the per-language fold."""
    if miss_penalty is None:
        miss_penalty = top_k
    text = F.col(text_col)
    if max_chars is not None:
        text = F.substring(text, 1, max_chars)
    # ``profiles`` may be the fitted DataFrame (collected here — its
    # lineage runs exactly once per CALL) or the pre-collected rows
    # from :func:`collect_profiles` (zero jobs here — the repeated-
    # classify form, e.g. one fit driving every streaming micro-batch)
    prof_rows = collect_profiles(profiles)
    langs = sorted({lang for lang, _, _ in prof_rows})
    if not langs:
        return (
            df.select(id_col)
            .filter(F.col(id_col).isNotNull())
            .distinct()
            .withColumn(output_col, F.lit(None).cast("string"))
            .withColumn(f"{output_col}_dist", F.lit(None).cast("bigint"))
        )
    # inline-VALUES LocalRelation, not createDataFrame(list): the
    # parallelize-backed relation re-pickles its rows through a Python
    # worker every time the broadcast build evaluates it; a
    # LocalRelation is driver-side JVM data — zero jobs, zero Python
    # round trips (round 11; same fix as corpus_io.parse_blocklist_text).
    # Grams never contain \n/\r (training collapses \s+ to ' '), and
    # quotes/backslashes are escaped.
    def _sqlstr(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    vals = ", ".join(
        f"({_sqlstr(lang)}, {_sqlstr(gram)}, {int(rank)})"
        for lang, gram, rank in prof_rows
    )
    profiles = df.sparkSession.sql(
        f"SELECT * FROM VALUES {vals} AS t(lang, gram, rank)"
    )
    # the document profile is computed INSIDE each row (run-length +
    # comparator sort over the bound gram array): zero shuffles until
    # the BOUNDED top_k-per-doc explode below — and the doc's gram
    # count rides the exploded rows (`__doc_grams`), so no second
    # branch ever re-reads the corpus. Zero-gram documents keep ONE
    # NULL-gram row through posexplode_outer (so every id reaches the
    # aggregate) and classify to NULL via the `__dg > 0` argmin guard
    # (a size-0 row would otherwise distance-0-tie every language and
    # pick the first).
    exploded = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            _row_top_grams(char_ngrams(text, n_values), top_k).alias("__top"),
        )
        .select(
            id_col,
            F.size("__top").alias("__doc_grams"),
            F.posexplode_outer("__top").alias("__pos", "__pg"),
        )
        .select(
            id_col,
            "__doc_grams",
            F.col("__pg.gram").alias("gram"),
            (F.col("__pos") + 1).alias("doc_rank"),
        )
    )
    # LEFT join: gram hits carry rank information per matching
    # language; doc grams no profile contains survive as lang-NULL
    # rows so the miss count (doc profile size − hits) stays exact
    # even for documents sharing no gram with ANY profile (those
    # all-miss ties break to the alphabetically first language, the
    # documented convention)
    joined = exploded.join(F.broadcast(profiles), "gram", "left")
    aggs = [F.max("__doc_grams").alias("__dg")]
    for i, lang in enumerate(langs):
        hit = F.col("lang") == lang
        aggs.append(
            F.sum(F.when(hit, F.abs(F.col("doc_rank") - F.col("rank"))))
            .alias(f"__hd_{i}")
        )
        aggs.append(F.count(F.when(hit, F.lit(1))).alias(f"__h_{i}"))
    agg = joined.groupBy(id_col).agg(*aggs)
    dists = F.array(*[
        F.struct(
            (
                F.coalesce(F.col(f"__hd_{i}"), F.lit(0)).cast("bigint")
                + (F.col("__dg").cast("bigint") - F.col(f"__h_{i}"))
                * F.lit(miss_penalty)
            ).alias("d"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ])
    # struct ordering is field-by-field: min by (distance, lang) IS
    # the deterministic argmin — no window, no second shuffle. The
    # `__dg > 0` guard keeps the zero-gram convention: no grams means
    # no evidence, classify NULL (those rows exist here only because
    # of posexplode_outer).
    return agg.select(
        id_col,
        F.when(F.col("__dg") > 0, F.array_min(dists)).alias("__b"),
    ).select(
        id_col,
        F.col("__b.lang").alias(output_col),
        F.col("__b.d").alias(f"{output_col}_dist"),
    )


def classify_language(
    df: DataFrame,
    profiles: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
    miss_penalty: int | None = None,
    output_col: str = "lang_id",
    max_chars: int | None = 4000,
) -> DataFrame:
    """Add ``output_col`` / ``output_col_dist`` to ``df``: every
    original row and column, plus the per-document verdict from
    :func:`classify_language_scores` (see there for semantics and the
    plan shape) re-attached by a left join on ``id_col``. Documents
    with no n-grams — and rows with a NULL id, which can never match a
    join key — come back NULL. Callers that only need the verdict
    relation should use :func:`classify_language_scores` directly and
    skip this join (one corpus scan and one id-keyed merge join
    cheaper)."""
    scores = classify_language_scores(
        df,
        profiles,
        id_col=id_col,
        text_col=text_col,
        top_k=top_k,
        n_values=n_values,
        miss_penalty=miss_penalty,
        output_col=output_col,
        max_chars=max_chars,
    )
    return df.join(scores, id_col, "left")


def classify_language_paragraphs(
    df: DataFrame,
    profiles: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
    miss_penalty: int | None = None,
    min_chars: int = 40,
    max_paragraphs: int = 64,
    max_chars: int | None = 1000,
) -> DataFrame:
    """Paragraph-level language identification — the CCNet deployment
    detail document-level classification misses: web pages mix
    languages (navigation in one, body in another; quoted passages),
    and corpus language filters want the MAJORITY language plus how
    pure the document is. Adds three columns:

    * ``lang_majority`` — the language classifying the most
      paragraphs (ties break alphabetically; NULL when nothing
      classified);
    * ``lang_fraction`` — classified paragraphs agreeing with the
      majority, in (0, 1] (the CCNet-style purity gate:
      ``lang_fraction < 1`` flags mixed-language documents);
    * ``n_paragraphs_classified`` — the sample size behind both.

    Mechanics: split on blank lines, drop paragraphs shorter than
    ``min_chars`` (boilerplate fragments misclassify), cap the
    explode at ``max_paragraphs`` head paragraphs and each paragraph
    at ``max_chars`` — so the per-document cost is a CONSTANT, same
    discipline as :func:`classify_language`'s head bound — then run
    the ordinary per-row profile classification on the paragraph
    relation and fold back per document. The profile side broadcasts;
    the only doc-keyed shuffles are the paragraph classification's
    own bounded ones plus one fold."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.slice(
                F.filter(
                    F.split(F.col(text_col), r"\n\s*\n"),
                    lambda p: F.length(F.trim(p)) >= min_chars,
                ),
                1,
                max_paragraphs,
            )
        ).alias("__pos", "__ptext"),
    )
    scored = classify_language(
        paras.withColumn(
            "__pid",
            F.concat(F.col(id_col).cast("string"), F.lit("\x00"),
                     F.col("__pos").cast("string")),
        ).select(F.col("__pid"), F.col(id_col), F.col("__ptext")),
        profiles,
        id_col="__pid",
        text_col="__ptext",
        top_k=top_k,
        n_values=n_values,
        miss_penalty=miss_penalty,
        output_col="__plang",
        max_chars=max_chars,
    )
    counts = (
        scored.filter(F.col("__plang").isNotNull())
        .groupBy(id_col, "__plang")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # majority = top (count desc, lang asc) — the same deterministic
    # tie-break convention as classify_language's argmin
    w = Window.partitionBy(id_col).orderBy(
        F.col("__n").desc(), F.col("__plang")
    )
    tw = Window.partitionBy(id_col)
    per_doc = (
        counts.withColumn("__rn", F.row_number().over(w))
        .withColumn("__total", F.sum("__n").over(tw))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__plang").alias("lang_majority"),
            (F.col("__n") / F.col("__total")).alias("lang_fraction"),
            F.col("__total").alias("n_paragraphs_classified"),
        )
    )
    return df.join(per_doc, id_col, "left")

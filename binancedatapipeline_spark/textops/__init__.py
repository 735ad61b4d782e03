"""Large-scale training-data operations over document tables.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), text
analysis (tokenization, quality scoring, language ID, fingerprints)
— all expressed as DataFrame plans over built-in functions so they
scale on a cluster; no Python row loops anywhere.
"""

from binancedatapipeline_spark.textops.analysis import (
    with_fingerprint,
    with_lang_guess,
    tfidf_top_terms,
    with_quality,
    with_tokens,
)
from binancedatapipeline_spark.textops.dedup import (
    band_index,
    dedup_clusters,
    incremental_lsh_pairs,
    incremental_near_dedup,
    exact_duplicates,
    exact_rep_map,
    minhash_signatures,
    lsh_candidate_pairs,
    near_dedup,
    ngram_jaccard_pairs,
    simhash,
    verify_pairs_jaccard,
)
from binancedatapipeline_spark.textops.bpe import (
    apply_bpe,
    bpe_vocab,
    train_bpe,
    word_counts,
)
from binancedatapipeline_spark.textops.lm import (
    perplexity_filter,
    score_documents,
    score_documents_map,
    unigram_model,
)
from binancedatapipeline_spark.textops.cleaning import (
    clean_lines,
    drop_frequent_lines,
    frequent_lines,
    gopher_filter,
    ngram_repetition,
    redact_pii,
    repetition_filter,
    with_line_repetition,
)
from binancedatapipeline_spark.textops.curate import (
    curate,
    curation_flags,
    curation_report,
)
from binancedatapipeline_spark.textops.decontam import (
    bloom_decontaminate,
    build_bloom_bitmap,
    contamination_hits,
    decontaminate,
)
from binancedatapipeline_spark.textops.packing import chunk_documents, pack_sequences
from binancedatapipeline_spark.textops.sketch import (
    cms_build,
    hist_build,
    hist_merge,
    hist_quantile,
    hll_build,
    hll_estimate,
    hll_merge,
    cms_error_bound,
    cms_estimate,
    cms_merge,
)
from binancedatapipeline_spark.textops.recipe import (
    RecipeResult,
    prepare_training_corpus,
)
from binancedatapipeline_spark.textops.sampling import (
    cap_per_group,
    hash_sample,
    select_token_budget,
    shuffle_rows,
    temperature_mixture_rates,
    mixture_oversample,
    mixture_sample,
    stable_split,
)
from binancedatapipeline_spark.textops.dsir import (
    bucket_distribution,
    dsir_select,
    importance_log_ratio,
    score_importance,
)
from binancedatapipeline_spark.textops.quality_clf import (
    QualityClassifier,
    quality_filter,
    score_quality,
    train_quality_classifier,
)
from binancedatapipeline_spark.textops.corpus_io import (
    dedup_by_url,
    parse_wet_records,
    psl_table,
    read_wet,
    read_wet_stream,
    with_url_parts,
)
from binancedatapipeline_spark.textops.spans import (
    apply_span_removal,
    duplicate_spans,
    incremental_duplicate_spans,
    remove_duplicate_spans,
    span_index,
)

__all__ = [
    "bucket_distribution",
    "dsir_select",
    "importance_log_ratio",
    "score_importance",
    "quality_filter",
    "score_quality",
    "train_quality_classifier",
    "QualityClassifier",
    "read_wet",
    "read_wet_stream",
    "parse_wet_records",
    "cap_per_group",
    "dedup_by_url",
    "with_url_parts",
    "psl_table",
    "apply_span_removal",
    "duplicate_spans",
    "incremental_duplicate_spans",
    "remove_duplicate_spans",
    "span_index",
    "with_fingerprint",
    "with_lang_guess",
    "tfidf_top_terms",
    "with_quality",
    "with_tokens",
    "band_index",
    "dedup_clusters",
    "incremental_lsh_pairs",
    "exact_rep_map",
    "incremental_near_dedup",
    "exact_duplicates",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "near_dedup",
    "simhash",
    "verify_pairs_jaccard",
    "apply_bpe",
    "bpe_vocab",
    "train_bpe",
    "word_counts",
    "perplexity_filter",
    "score_documents",
    "score_documents_map",
    "unigram_model",
    "clean_lines",
    "drop_frequent_lines",
    "frequent_lines",
    "gopher_filter",
    "ngram_repetition",
    "redact_pii",
    "repetition_filter",
    "with_line_repetition",
    "curate",
    "curation_flags",
    "curation_report",
    "contamination_hits",
    "bloom_decontaminate",
    "build_bloom_bitmap",
    "decontaminate",
    "cms_build",
    "cms_error_bound",
    "cms_estimate",
    "cms_merge",
    "hist_build",
    "hist_merge",
    "hist_quantile",
    "hll_build",
    "hll_estimate",
    "hll_merge",
    "chunk_documents",
    "pack_sequences",
    "hash_sample",
    "mixture_oversample",
    "mixture_sample",
    "RecipeResult",
    "prepare_training_corpus",
    "select_token_budget",
    "shuffle_rows",
    "temperature_mixture_rates",
    "stable_split",
]

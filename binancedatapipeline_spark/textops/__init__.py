"""Large-scale training-data operations over document tables.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), text
analysis (tokenization, quality scoring, language ID, fingerprints)
— all expressed as DataFrame plans over built-in functions so they
scale on a cluster; no Python row loops anywhere.
"""

from binancedatapipeline_spark.textops.analysis import (
    with_fingerprint,
    with_lang_guess,
    with_quality,
    with_tokens,
)
from binancedatapipeline_spark.textops.dedup import (
    exact_duplicates,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)

__all__ = [
    "with_fingerprint",
    "with_lang_guess",
    "with_quality",
    "with_tokens",
    "exact_duplicates",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
]

from .text import (
    add_fingerprint,
    add_langid,
    add_quality,
    add_token_stats,
    shingles,
)
from .dedup import (
    exact_dedup_groups,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk_bruteforce, quantize_embedding, quantized_dot

__all__ = [
    "add_fingerprint",
    "add_langid",
    "add_quality",
    "add_token_stats",
    "shingles",
    "exact_dedup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk_bruteforce",
    "quantize_embedding",
    "quantized_dot",
]

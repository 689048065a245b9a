from parconnect_spark.functions.hashing import wang_hash, wang_unhash, permute_ids
from parconnect_spark.functions.sketch import (
    count_min_sketch,
    cms_estimate,
    hll_registers,
    hll_estimate,
)
from parconnect_spark.functions.text import (
    quality_features,
    quality_score,
    language_id,
    fingerprint,
    repetition_features,
    token_count,
    tfidf_top_terms,
)
from parconnect_spark.functions.dedup import (
    exact_dup_groups,
    ngram_jaccard_pairs,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    simhash,
    simhash_near_pairs,
    near_dup_clusters,
    contamination_check,
)
from parconnect_spark.functions.sampling import (
    stratified_sample,
    hash_split,
    cluster_split,
    uniform_hash,
)
from parconnect_spark.functions.similarity import (
    cosine_scores,
    brute_force_topk,
    lsh_topk,
    ivf_topk,
    embedding_near_dup_pairs,
)

__all__ = [
    "wang_hash",
    "wang_unhash",
    "permute_ids",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint",
    "repetition_features",
    "token_count",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "simhash",
    "simhash_near_pairs",
    "near_dup_clusters",
    "contamination_check",
    "stratified_sample",
    "hash_split",
    "cluster_split",
    "uniform_hash",
    "cosine_scores",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dup_pairs",
]

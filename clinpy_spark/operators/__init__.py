from clinpy_spark.operators.dedup import (  # noqa: F401
    exact_dedup_stats,
    minhash_signature,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from clinpy_spark.operators.similarity import brute_force_topk, lsh_topk  # noqa: F401

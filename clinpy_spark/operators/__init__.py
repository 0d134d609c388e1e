from clinpy_spark.operators.dedup import (  # noqa: F401
    exact_dedup_stats,
    minhash_signature,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from clinpy_spark.operators.similarity import brute_force_topk, lsh_topk  # noqa: F401
from clinpy_spark.operators.bpe import bpe_encode, bpe_train  # noqa: F401
from clinpy_spark.operators.sketch import (  # noqa: F401
    bloom_bits,
    bloom_probe,
    cms_merge,
    count_min,
)

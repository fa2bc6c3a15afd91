from sclera_spark.llm.dedup import (
    dedup_exact,
    minhash_signatures,
    minhash_dup_pairs,
    minhash_dedup,
    simhash,
    simhash_dup_pairs,
    ngram_jaccard_pairs,
)
from sclera_spark.llm.similarity import (
    cosine_topk,
    hyperplane_buckets,
    ann_topk,
    ivf_index,
    ivf_load,
    ivf_topk,
    ivf_topk_indexed,
    ivf_write,
    embedding_dup_pairs,
)
from sclera_spark.llm.text import (
    token_count,
    quality_scores,
    language_id,
    doc_fingerprint,
)

__all__ = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_dup_pairs",
    "minhash_dedup",
    "simhash",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "hyperplane_buckets",
    "ann_topk",
    "ivf_index",
    "ivf_load",
    "ivf_topk",
    "ivf_topk_indexed",
    "ivf_write",
    "embedding_dup_pairs",
    "token_count",
    "quality_scores",
    "language_id",
    "doc_fingerprint",
]

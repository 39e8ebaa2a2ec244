"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. See the submodule docstrings for the 100 TB
design notes; everything row-level is JVM built-ins, Python appears only in
the clearly-stubbed multimodal decoders (Arrow-batched)."""

from siddhi_io_cdc_spark.functions.dedup import (
    connected_components,
    curate_documents,
    dedup_exact,
    dedup_near,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
    token_shingle_hashes,
    token_shingles,
)
from siddhi_io_cdc_spark.functions.similarity import (
    ann_cosine,
    cosine,
    dot,
    embedding_near_dup_pairs,
    ivf_ann_cosine,
    label_centroids,
    topk_cosine,
)
from siddhi_io_cdc_spark.functions.text import (
    fingerprint,
    lang_detect,
    normalize_text,
    quality_score,
    text_stats,
    token_count,
    top_ngrams,
    word_count,
)

__all__ = [
    "ann_cosine",
    "cosine",
    "connected_components",
    "curate_documents",
    "dedup_exact",
    "dedup_near",
    "dot",
    "embedding_near_dup_pairs",
    "fingerprint",
    "ivf_ann_cosine",
    "lang_detect",
    "minhash_lsh_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "normalize_text",
    "quality_score",
    "simhash64",
    "simhash_pairs",
    "text_stats",
    "token_count",
    "token_shingle_hashes",
    "token_shingles",
    "top_ngrams",
    "label_centroids",
    "topk_cosine",
    "word_count",
]

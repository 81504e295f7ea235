"""End-to-end pipelines: CDC upsert, dedup, similarity, text analysis,
multimodal plumbing, corpus prep, and the query/oracle surface."""

from .cdc import CDCPipeline, RunReport, cdc_validator_spec, key_partition
from .corpus import prepare_corpus
from .dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_dedup,
    simhash_dedup,
)
from .similarity import IvfIndex, knn_brute_force, knn_ivf, train_centroids
from .text import (
    LangIdStage,
    add_fingerprint,
    add_quality_score,
    add_token_count,
)

__all__ = [
    'CDCPipeline',
    'IvfIndex',
    'LangIdStage',
    'RunReport',
    'add_fingerprint',
    'add_quality_score',
    'add_token_count',
    'cdc_validator_spec',
    'embedding_dedup',
    'exact_dedup',
    'key_partition',
    'knn_brute_force',
    'knn_ivf',
    'minhash_dedup',
    'prepare_corpus',
    'simhash_dedup',
    'train_centroids',
]

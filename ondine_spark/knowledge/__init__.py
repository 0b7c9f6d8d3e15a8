from ondine_spark.knowledge.chunker import (
    fixed_chunks,
    semantic_chunks,
    sentence_frame,
    split_sentences,
)
from ondine_spark.knowledge.embedders import (
    DeterministicEmbedder,
    embed_column,
    ngram_buckets,
)
from ondine_spark.knowledge.store import KnowledgeStore, rrf_fuse
from ondine_spark.knowledge.retrieval import attach_context

__all__ = [
    "split_sentences",
    "sentence_frame",
    "fixed_chunks",
    "semantic_chunks",
    "DeterministicEmbedder",
    "embed_column",
    "ngram_buckets",
    "KnowledgeStore",
    "rrf_fuse",
    "attach_context",
]

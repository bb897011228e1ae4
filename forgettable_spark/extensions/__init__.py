"""LLM-data-pipeline extensions: text analysis, dedup, similarity search,
multimodal column plumbing — first-class operators alongside the
forget-table core (BASELINE.json north star)."""

from forgettable_spark.extensions import text, dedup, similarity, multimodal

__all__ = ["text", "dedup", "similarity", "multimodal"]

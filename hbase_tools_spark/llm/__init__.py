"""LLM-data-pipeline operators (SURVEY.md §7 M8): dedup, similarity
search, text analysis, multimodal plumbing — first-class at 100 TB."""

from . import corpus, dedup, multimodal, pipeline, search, similarity, text  # noqa: F401

__all__ = [
    "corpus", "dedup", "multimodal", "pipeline", "search", "similarity", "text",
]

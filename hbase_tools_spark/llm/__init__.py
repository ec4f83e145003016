"""LLM-data-pipeline operators (SURVEY.md §7 M8): dedup, similarity
search, text analysis, multimodal plumbing — first-class at 100 TB."""

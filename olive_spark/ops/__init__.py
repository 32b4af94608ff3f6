"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. All Spark-first (SURVEY.md north star)."""

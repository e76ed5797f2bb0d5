"""LLM-data-pipeline operator families: text analysis, deduplication,
similarity search, multimodal column plumbing."""

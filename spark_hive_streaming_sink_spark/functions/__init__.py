"""LLM-data-pipeline function modules (dedup, text, similarity, multimodal)."""

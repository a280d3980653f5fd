"""Spark operators: segmentation, classification, extraction, dedup,
similarity, text analysis, multimodal plumbing, metrics."""

"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) — Spark-first, shuffle-conscious."""

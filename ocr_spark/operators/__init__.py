"""Training-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing. All built from JVM-side column expressions (no
per-row Python); only the multimodal decode stub uses mapInPandas."""

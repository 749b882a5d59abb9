"""Training-data-pipeline operators beyond the reference's own stages.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings, text analysis, multimodal-column plumbing
(images / video / PCM audio / PDF text), and HTML main-content extraction
(boilerplate strip + DOM-heuristic block pick) — the operations a 100 TB
training-data pipeline needs around the extraction engine. Everything
stays in native Spark SQL expressions (whole-stage codegen) unless a stage is fundamentally non-relational; no row-at-a-time
Python anywhere.
"""

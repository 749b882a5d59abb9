"""Training-data-pipeline operators beyond the reference's own stages.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings, text analysis, and multimodal-column plumbing —
the operations a 100 TB training-data pipeline needs around the extraction
engine. Everything stays in native Spark SQL expressions (whole-stage
codegen) unless a stage is fundamentally non-relational; no row-at-a-time
Python anywhere.
"""

"""Scalar/vector function surface for large-scale training-data pipelines.

Beyond the reference's operator inventory (SURVEY.md §2), these modules
implement the operations a 100 TB LLM-data pipeline needs: text
analysis, deduplication (exact → MinHash-LSH → SimHash → embedding
cosine), similarity search, and multimodal binary-column plumbing.

Everything is built on JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen) — Python touches data only in the explicitly
Arrow-batched multimodal decode stubs.
"""

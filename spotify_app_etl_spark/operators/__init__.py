"""Custom operators the engine adds beyond vanilla Spark built-ins.

LLM-data-pipeline operators (the north-star extensions per
BASELINE.json): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), multimodal column handling, and an as-of join.
All are compositions of DataFrame built-ins where semantics allow,
dropping to Arrow-batched Pandas UDFs only where they don't
(SURVEY.md §4: zero custom Catalyst rules needed).
"""

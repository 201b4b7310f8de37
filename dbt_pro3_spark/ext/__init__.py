"""Large-scale training-data-pipeline operators (driver-mandated extensions,
SURVEY.md §2.K): deduplication (exact + MinHash-LSH + SimHash + n-gram
Jaccard + embedding cosine), similarity search (brute-force and LSH-bucketed
ANN), text analysis (lang-id, quality, tokens, fingerprints), and multimodal
binary-column plumbing.

These are NOT in the reference repo — it has no UDF/streaming surface at all
(SURVEY §2.K) — they are the operators a 100 TB LLM-data pipeline needs on
top of the relational core.
"""

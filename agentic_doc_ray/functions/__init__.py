"""Large-scale training-data operators (beyond the reference's surface).

Each operator is a Ray Data stage or pipeline over the driver's synthetic
tables: text analysis (token counts, quality metrics, language ID,
fingerprints), deduplication (exact, MinHash-LSH, SimHash, embedding
near-dup), similarity search (brute-force + LSH-bucketed cosine top-k), and
stubbed multimodal decode plumbing.
"""

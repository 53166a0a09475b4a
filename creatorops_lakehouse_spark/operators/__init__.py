"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup),
similarity search (brute-force cosine top-k, LSH-bucketed ANN), text
analysis (language id, quality scoring, token counting, fingerprinting),
multimodal binary-column plumbing, and skew-handling utilities.

All hot paths are native pyspark.sql.functions (JVM, codegen); Python only
appears in clearly-marked Pandas-UDF plumbing for multimodal decode stubs.
"""

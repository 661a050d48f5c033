"""Training-data pipeline operators over the documents/embeddings
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + LSH ANN), text
analysis (language-ID, quality scoring, token counting, rolling-hash
fingerprints), multimodal binary-column plumbing, and token-sequence
packing (concat-and-chunk context windows via distributed prefix sum;
greedy whole-doc bins via hash-bucketed applyInPandas).

Everything is DataFrame-API (JVM-side, codegen) except the multimodal
feature extractor, which is Arrow-batched ``mapInPandas`` by design
(binary payloads need Python-side decoding at deploy time).

Cross-engine exactness convention (shared with __spark_entry__):
hashes are md5-derived 60-bit longs (identical in DuckDB), floats are
quantized to integer units before any aggregation, and derived doubles
(cosine, jaccard) are computed from exact integers so both engines see
bit-identical inputs.
"""

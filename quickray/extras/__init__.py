"""Large-scale training-data operators beyond the reference's surface:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (brute-force + IVF ANN), text analysis (token stats, quality,
language-ID, fingerprints) and multimodal column plumbing.
All are Ray Data pipelines over Arrow batches."""

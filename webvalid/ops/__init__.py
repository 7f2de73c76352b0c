"""Training-data-pipeline operators beyond the reference's scope.

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), approximate similarity search, text analysis (language id,
quality scoring, token counting, fingerprinting), and multimodal
decode plumbing — all expressed Ray-Data-first (`map_batches` over
Arrow, groupby only for genuine co-location needs).
"""

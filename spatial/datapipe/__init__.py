"""datapipe -- large-scale training-data operations over document corpora.

First-class components alongside the spatial engine: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), approximate
similarity search, text analysis (language id, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.
"""

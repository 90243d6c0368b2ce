"""Medallion transformations + large-scale extension operators.

Core (reference parity, SURVEY §2):
  ``staging``      — typed flattening + latest-per-key dedup (P1-P3, W1, F13)
  ``intermediate`` — validity filters + enrichment join (P4-P6, J1)
  ``marts``        — SCD-1 dimension + hourly pivot facts (W2, J2, A1-A3, F7-F9)

Extensions (100 TB training-data pipeline ops):
  ``dedup``        — exact / MinHash-LSH / SimHash / n-gram Jaccard /
                     embedding-cosine near-duplicate detection
  ``similarity``   — brute-force + LSH-bucketed ANN over embeddings
  ``text``         — language-ID, quality scoring, token counting,
                     fingerprinting
  ``multimodal``   — binary-column decode/feature plumbing (stubs)
"""

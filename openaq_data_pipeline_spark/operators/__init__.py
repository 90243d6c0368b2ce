"""Medallion transformations + large-scale extension operators.

Core (reference parity, SURVEY §2):
  ``staging``      — typed flattening + latest-per-key dedup (P1-P3, W1, F13)
  ``intermediate`` — validity filters + enrichment join (P4-P6, J1)
  ``marts``        — SCD-1 dimension + hourly pivot facts (W2, J2, A1-A3, F7-F9)

Extensions (100 TB training-data pipeline ops):
  ``dedup``        — exact / MinHash-LSH / SimHash / n-gram Jaccard /
                     containment / embedding-cosine near-dup tiers +
                     connected components + survivor policies
  ``incremental_dedup`` / ``incremental_fuzzy`` — the persisted
                     cross-batch index tiers (exact, Jaccard bands,
                     SimHash, containment)
  ``spans``        — substring-level (ExactSubstr) span dedup
  ``similarity``   — ANN: brute-force / LSH / trained-quantizer IVF
                     (float + int8 + rescore) / PQ + IVF-PQ;
                     SemDeDup semantic dedup; int8 quantization
  ``retrieval``    — BM25 over a persisted term-bucketed inverted
                     index; RRF hybrid fusion; MMR re-ranking
  ``text``         — language-ID, quality scoring (incl. the Gopher
                     rule battery), token counting, fingerprinting,
                     repetition signals, Unicode normalization,
                     HTML→text extraction, URL canonicalization
  ``lm``           — add-one bigram and stupid-backoff trigram LM
                     quality gates (fixed-point + log-likelihood)
  ``tokenizer``    — BPE (distributed + driver trainer, encode to
                     ids), unigram-LM (hard-EM Viterbi), WordPiece
                     (likelihood-scored merges, greedy encode),
                     persisted tokenizer artifacts
  ``curation``     — decontamination, stratified / mixture / PPS
                     sampling, chunking, packing, PII, boilerplate,
                     leakage-safe splitting, shard + WebDataset export
  ``classifier``   — DataFrame-native logistic-regression quality gate
  ``graph``        — fixed-point PageRank (Pregel-style supersteps)
  ``sketches``     — persisted mergeable HLL + KLL-quantile rollups
  ``ids``          — global contiguous ids + global cumulative sums
  ``multimodal``   — real BMP/PPM/PNG/JPEG/GIF(+animation)/TIFF, WAV,
                     MJPEG-in-AVI codecs over binary columns (Arrow
                     mapInPandas); WebP/MP4 header walks; perceptual
                     image pHash + acoustic fingerprints on the
                     SimHash band layout
  ``vp8l``         — WebP-lossless (VP8L) pixel codec subset:
                     canonical prefix codes, LZ77, color cache,
                     subtract-green / color-indexing transforms,
                     meta prefix-code groups
  ``temporal`` / ``history`` — as-of & range joins; SCD-2 / CDC /
                     gap-fill
  ``retraction``   — takedown propagation: scrub every persisted
                     index + partition-pruned lake deletes + every
                     retained time-travel snapshot + denylist gate
  ``frontier``     — politeness-interleaved crawl scheduling +
                     robots.txt fetch policy (RFC 9309 prefix core)
  ``profiling``    — one-pass column statistics + feed drift diff
"""

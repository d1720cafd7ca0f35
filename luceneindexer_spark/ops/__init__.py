"""Training-data pipeline operators over the document corpus.

Beyond the reference's own surface (SURVEY.md §2), these are the operations a
large-scale training-data pipeline needs, built Spark-first:

- ``dedup``: exact (hash groupBy), MinHash+LSH banding, SimHash, n-gram
  Jaccard verification, embedding-cosine near-dup
- ``similarity``: brute-force cosine top-k + LSH-bucketed ANN over an
  ``array<float>`` embedding column
- ``textstats``: language-ID, quality scoring, token counting, winnowing
  document fingerprints
- ``multimodal``: opaque binary media columns + Arrow-batched decode; real
  image decode via a pure-stdlib PNG codec (Pillow preferred when present),
  plus the SQL-reproducible deterministic stub for oracle-checked contracts
- ``sampling``: deterministic hash train/val/test split, per-category
  mixture sampling, token-budget sharding (distributed prefix sum)
- ``maintenance``: delete-list anti-join, duplicate groups, browse

All hashing is built on ``hashing.h60`` (first 15 hex chars of md5 as int64)
so every operator has an exactly-reproducing ANSI-SQL oracle (DuckDB) — no
engine-specific hash functions in any oracle-checked path.
"""

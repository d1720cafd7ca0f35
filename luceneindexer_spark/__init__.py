"""luceneindexer_spark — a from-scratch, PySpark-native fulltext index + BM25 engine.

Re-expresses the query and data-processing capabilities of the reference
(LEAKYMN/LuceneIndexer, a JavaFX wrapper around Apache Lucene 6.1.0 — see
SURVEY.md) as an idiomatic Spark DataFrame pipeline:

- code-aware tokenization via vectorized pandas/Arrow UDFs (``tokenizer``)
- per-partition sorted posting lists, delta + varint block compression with
  per-block max-tf metadata (``codecs``, ``index.build``)
- global inverted index via a salted repartition-by-term shuffle with explicit
  hot-term skew handling (``index.build``)
- BM25 (k1=1.2, b=0.75) top-k with posting-list intersection and block-max
  pruning (``query.wand``), rank-identical to a pure-DataFrame oracle
  (``query.oracle``)
- checkpoint manifest with per-partition lineage for resumable builds
  (``index.manifest``)
- training-data pipeline operators: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  similarity search, text analysis, multimodal plumbing (``ops``)

Packaged for ``spark-submit --py-files`` (pure-Python, stdlib + numpy/pandas
/pyarrow only).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75

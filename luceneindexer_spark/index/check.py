"""Lucene ``CheckIndex`` analog: a full-audit decode pass over the index.

Lucene ships ``CheckIndex`` to verify segment integrity — postings in strict
docID order, per-term statistics consistent with the postings they summarize,
doc counts consistent across structures. The reference wrapper leans on those
invariants implicitly every time it reopens an IndexReader
(``lucene/cLuceneIndexReader.java:134-137`` via ``cIndex.java``); here the
audit is explicit and distributed: ONE mapInPandas pass decodes every
postings row (numpy varint decode, no per-posting Python), verifies the
structural invariants locally, and the per-term aggregates are cross-checked
against the published ``term_stats`` table with a vocabulary-sized join.

The returned summary is recomputable from the RAW corpus by the DuckDB
oracle — equality of (n_docs, vocab_size, sum_doc_freq, sum_total_term_freq)
plus zero violations/mismatches proves the full index round-trips the corpus.

Spark shape at scale: the audit is embarrassingly parallel over postings
rows (the dominant cost — a full decode — runs where the data lives; no
shuffle), followed by one term-keyed agg+join whose rows are
vocabulary-sized, not corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import (decode_blocks_overlapping, positions_decode,
                      positions_encode)
from .build import DOCLEN_TERM, IndexPaths

AUDIT_SCHEMA = "term string, range_id long, df long, cf long, violations long"

SUMMARY_SCHEMA = ("n_docs long, vocab_size long, sum_doc_freq long, "
                  "sum_total_term_freq long, structural_violations long, "
                  "stats_mismatches long")


def _audit_generator(range_size: int):
    """mapInPandas fn: decode each postings row fully and verify its
    structural invariants; emit (term, range_id, df, cf, violations)."""
    from ..query.engine import _ep_from_row

    def gen(batches):
        for pdf in batches:
            terms: list[str] = []
            rids: list[int] = []
            dfs: list[int] = []
            cfs: list[int] = []
            viols: list[int] = []
            for row in pdf.itertuples(index=False):
                ep = _ep_from_row(row)
                docs, tfs = decode_blocks_overlapping(ep, -1, 1 << 62)
                n = int(docs.size)
                v = 0
                if n != ep.n:
                    v += 1                      # header df vs decoded count
                if n > 1 and not (np.diff(docs) > 0).all():
                    v += 1                      # strict docID order
                rlo = int(row.range_id) * range_size
                if n and (int(docs[0]) < rlo
                          or int(docs[-1]) >= rlo + range_size):
                    v += 1                      # docIDs within range bounds
                if n and int(tfs.min()) < 1:
                    v += 1                      # tf >= 1
                if int(tfs.sum()) != int(row.cf):
                    v += 1                      # header cf vs decoded sum
                if n and int(tfs.max()) != int(row.max_tf):
                    v += 1                      # header max_tf
                if row.pos_enc is not None:
                    # positional payload: exactly tf positions per posting,
                    # strictly increasing within each doc, and the buffer
                    # round-trips (re-encode == stored bytes, so there are
                    # no trailing/garbage bytes the decoder never touched)
                    buf = bytes(row.pos_enc)
                    starts = np.cumsum(tfs) - tfs
                    try:
                        flat = positions_decode(buf, tfs)
                    except Exception:
                        v += 1
                    else:
                        ok_mono = True
                        if flat.size > 1:
                            okd = np.diff(flat) > 0
                            okd[starts[1:] - 1] = True   # doc boundaries
                            ok_mono = bool(okd.all())
                        if (not ok_mono or (flat < 0).any()
                                or positions_encode(flat, starts)[0] != buf):
                            v += 1
                bn = np.asarray(row.block_n, dtype=np.int64)
                if int(bn.sum()) != n or (bn < 1).any():
                    v += 1                      # block layout covers postings
                else:
                    starts = np.cumsum(bn) - bn
                    ends = np.cumsum(bn)
                    if not (np.array_equal(docs[starts],
                                           np.asarray(row.block_first))
                            and np.array_equal(docs[ends - 1],
                                               np.asarray(row.block_last))
                            and np.array_equal(
                                np.maximum.reduceat(tfs, starts),
                                np.asarray(row.block_maxtf))
                            and np.array_equal(
                                np.minimum.reduceat(tfs, starts),
                                np.asarray(row.block_mintf))):
                        v += 1                  # per-block skip metadata
                terms.append(row.term)
                rids.append(int(row.range_id))
                dfs.append(n)
                cfs.append(int(tfs.sum()))
                viols.append(v)
            if terms:
                yield pd.DataFrame({"term": terms, "range_id": rids,
                                    "df": dfs, "cf": cfs,
                                    "violations": viols})
    return gen


def check_index(spark: SparkSession, root: str) -> DataFrame:
    """Audit a published index; returns ONE summary row (see module doc).

    ``structural_violations`` counts per-row invariant failures from the
    decode pass; ``stats_mismatches`` counts vocabulary terms whose decoded
    global (df, cf) disagree with the published term_stats table (or that
    appear on only one side). Both are 0 on a healthy index.
    """
    from ..query.engine import load_meta

    meta = load_meta(spark, root)
    paths = IndexPaths(root)
    post = spark.read.parquet(paths.postings)
    audited = post.mapInPandas(_audit_generator(meta.range_size),
                               AUDIT_SCHEMA).persist()

    per_term = (audited.filter(F.col("term") != DOCLEN_TERM)
                .groupBy("term")
                .agg(F.sum("df").alias("df_dec"),
                     F.sum("cf").alias("cf_dec")))
    stats = spark.read.parquet(paths.term_stats).select("term", "df", "cf")
    mism = (per_term.join(stats, "term", "full_outer")
            .filter((F.col("df_dec").isNull() | F.col("df").isNull()
                     | (F.col("df_dec") != F.col("df"))
                     | (F.col("cf_dec") != F.col("cf"))))
            .count())

    summary = (audited
               .agg(F.sum("violations").alias("structural_violations"),
                    F.sum(F.when(~F.col("term").contains(":")
                                 & (F.col("term") != DOCLEN_TERM),
                                 F.col("df"))).alias("sum_doc_freq"),
                    F.sum(F.when(~F.col("term").contains(":")
                                 & (F.col("term") != DOCLEN_TERM),
                                 F.col("cf"))).alias("sum_total_term_freq"),
                    F.count_distinct(
                        F.when(~F.col("term").contains(":")
                               & (F.col("term") != DOCLEN_TERM),
                               F.col("term"))).alias("vocab_size"))
               .collect()[0])
    audited.unpersist()

    n_docs = spark.read.parquet(paths.docmap).count()
    v = int(summary["structural_violations"] or 0)
    if n_docs != meta.n_docs:
        v += 1                                  # docmap vs corpus_stats
    row = [(int(n_docs), int(summary["vocab_size"] or 0),
            int(summary["sum_doc_freq"] or 0),
            int(summary["sum_total_term_freq"] or 0), v, int(mism))]
    return spark.createDataFrame(row, SUMMARY_SCHEMA)

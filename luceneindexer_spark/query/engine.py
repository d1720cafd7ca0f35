"""Query engine over the compressed inverted index — the fast path.

Reference parity: search entry point ``lucene/cLuceneIndexReader.java:272-397``
(conjunctive BooleanQuery of MUST clauses → Lucene doc-at-a-time posting
intersection with skip lists → BM25 → TopDocs). Spark shape (SURVEY.md §3.2):

  tokenize query (driver, same pinned tokenizer)
    → prune postings scan to the query terms' buckets (partition pruning)
      and terms (parquet predicate pushdown)
    → cogroup with norms by range_id → per-range vectorized scoring with
      BLOCK-MAX WAND pruning (BASELINE.json north_rule): per-block score
      upper bounds from block_maxtf + the norms rows' block_mintf (min
      doclen per 128-doc block — metadata only, no norms decode), blocks
      visited in upper-bound order, decoding stops once the running kth
      score exceeds every remaining block's bound. Exact: a skipped block
      provably contains no top-k (or tied) doc.
    → exact BM25 (k1=1.2 b=0.75, fp64, term-sorted accumulation) on the
      surviving candidates → per-range top-k
    → global TakeOrderedAndProject: orderBy(score desc, doc_id asc).limit(k)
    → optional hydrate: broadcast-join the k rows back to the docmap
      (stored-fields analog of ``searcher.doc(id)``, R:352-359).

Delete semantics: tombstones (ops.maintenance delete list) are encoded as
range-partitioned DEL_TERM pseudo-postings and cogrouped into the scorer,
which filters them out before top-k selection — a deleted doc can never
surface and never displaces a live doc from the k results (reference:
``cLuceneIndexReader.java:371-383`` deletes lazily at query time). The
delete list never reaches the driver and never rides a task closure: each
range's scorer sees only ITS tombstones, so a large delete backlog costs
one extra range-partitioned shuffle leg, not a per-task pickle payload.

Scale: postings are doc-range-partitioned, so query fan-out is one small
shuffle of only the query terms' rows, each range scored independently —
no single node ever sees a whole hot-term posting list.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..codecs import (EncodedPostings, decode_block, decode_blocks_overlapping,
                      decode_postings, encode_postings, positions_decode)
from ..index.build import DOCLEN_TERM, POSTINGS_SCHEMA, IndexPaths
from .oracle import bm25_score_expr, query_terms

#: pseudo-term carrying a per-range candidate allowlist (exact multi-field
#: conjunction): the tokenizer emits only [a-z0-9]+ and the norms sentinel is
#: "", so "\x01" can never collide with a real term.
ALLOW_TERM = "\x01"

#: pseudo-term carrying a per-range tombstone list: the delete list is
#: encoded as range-partitioned pseudo-postings and COGROUPED into the
#: scorers exactly like ALLOW_TERM rows — never collected to the driver,
#: never shipped inside a task closure, so a 10^8-row delete backlog costs
#: one extra range-partitioned shuffle leg instead of a per-task pickle.
DEL_TERM = "\x02"

#: the exact column set the range scorers consume (= POSTINGS_SCHEMA order);
#: projecting the cogroup inputs to it drops the bucket/wave partition
#: columns and lets allowlist rows union in cleanly.
SCORER_COLS = [c.strip().split(" ")[0] for c in POSTINGS_SCHEMA.split(",")]

#: uncached-path range pruning is collected to the driver only when the
#: rarest-term-df bound on the candidate range count fits here; above it
#: the prune is skipped (hot terms touch most ranges — the isin would be
#: huge and buy nothing)
RANGE_PRUNE_MAX = 4096


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    range_size: int
    n_buckets: int
    n_ranges: int
    snapshot: str
    positions: bool
    fields: tuple[str, ...] = ()


def load_meta(spark: SparkSession, root: str) -> IndexMeta:
    r = spark.read.parquet(IndexPaths(root).corpus_stats).collect()[0]
    d = r.asDict()
    fields = tuple(f for f in (d.get("fields") or "").split(",") if f)
    return IndexMeta(
        n_docs=r["n_docs"], avgdl=float(r["avgdl"]),
        range_size=int(r["range_size"]), n_buckets=int(r["n_buckets"]),
        n_ranges=int(r["n_ranges"]), snapshot=r["snapshot"],
        positions=bool(r["positions"]), fields=fields)


def _buckets_of(terms: list[str], n_buckets: int,
                spark: SparkSession) -> dict[str, int]:
    # must match F.pmod(F.xxhash64(term), n_buckets) used at build time;
    # computed via one tiny local DataFrame to reuse the JVM hash exactly
    rows = (spark.createDataFrame([(t,) for t in terms], "term string")
            .select("term", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                    .cast("int").alias("b")).collect())
    return {r["term"]: int(r["b"]) for r in rows}


def _ep_from_row(row) -> EncodedPostings:
    return EncodedPostings(
        n=int(row.df), max_tf=int(row.max_tf),
        block_first=np.asarray(row.block_first, dtype=np.int64),
        block_last=np.asarray(row.block_last, dtype=np.int64),
        block_maxtf=np.asarray(row.block_maxtf, dtype=np.int32),
        block_mintf=np.asarray(row.block_mintf, dtype=np.int32),
        block_off_d=np.asarray(row.block_off_d, dtype=np.int32),
        block_off_t=np.asarray(row.block_off_t, dtype=np.int32),
        block_n=np.asarray(row.block_n, dtype=np.int32),
        docs_enc=bytes(row.docs_enc), tfs_enc=bytes(row.tfs_enc),
    )


def _pooled(pool: dict | None, key, ctor):
    """Per-invocation construction memo for batched serving: with a pool,
    queries in the same batch share one decoded-postings object per (kind,
    term) key inside a range invocation — the shared-scan half of
    ``topk_batch`` (a hot term appearing in many queries of a batch is
    copied out of Arrow and block-decoded ONCE per range, not once per
    query). ``None`` keeps the single-query behavior: construct fresh."""
    if pool is None:
        return ctor()
    v = pool.get(key)
    if v is None:
        v = ctor()
        pool[key] = v
    return v


def _idf(n_docs: int, df: int) -> float:
    return float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Boolean membership mask of ``values`` in ascending ``sorted_arr``."""
    if sorted_arr.size == 0:
        return np.zeros(values.size, dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    ok = idx < sorted_arr.size
    m = np.zeros(values.size, dtype=bool)
    m[ok] = sorted_arr[idx[ok]] == values[ok]
    return m


class _BlockCache:
    """Lazy per-block postings decoder with an optional decode counter.

    The WAND audit surface: ``counters["blocks_decoded"]`` vs
    ``counters["blocks_total"]`` proves score pruning skipped real work
    (tests call the scorer driver-side with a shared dict; in the
    distributed path the counters live in each Python worker)."""

    __slots__ = ("ep", "_blocks", "counters")

    def __init__(self, ep: EncodedPostings, counters: dict | None = None):
        self.ep = ep
        self._blocks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.counters = counters
        if counters is not None:
            counters["blocks_total"] = (counters.get("blocks_total", 0)
                                        + int(ep.block_first.size))

    def block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        b = self._blocks.get(i)
        if b is None:
            b = decode_block(self.ep, i)
            self._blocks[i] = b
            if self.counters is not None:
                self.counters["blocks_decoded"] = (
                    self.counters.get("blocks_decoded", 0) + 1)
        return b

    def overlapping_idx(self, lo: int, hi: int) -> np.ndarray:
        ep = self.ep
        return np.flatnonzero((ep.block_last >= lo) & (ep.block_first <= hi))

    def blocks_concat(self, idx) -> tuple[np.ndarray, np.ndarray]:
        """Concatenate the given block indices (ascending) → sorted docs."""
        if len(idx) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        parts = [self.block(int(i)) for i in idx]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))


def _interval_reduce(values: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                     default: float, ufunc) -> np.ndarray:
    """``ufunc.reduce(values[lo[i]:hi[i]])`` for each i, empty → default —
    in ONE vectorized pass: interleave [lo0, hi0, lo1, hi1, ...] and reduceat
    (odd segments are garbage and dropped; a sentinel element keeps hi == n
    a valid index; numpy defines reduceat on idx[j] >= idx[j+1] as x[idx[j]],
    masked out by the emptiness test)."""
    n = lo.size
    if n == 0:
        return np.empty(0, dtype=np.float64)
    v = np.append(values.astype(np.float64), default)
    idx = np.empty(2 * n, dtype=np.int64)
    idx[0::2] = lo
    idx[1::2] = hi
    out = ufunc.reduceat(v, idx)[0::2]
    return np.where(hi > lo, out, default)


def _interval_min(values, lo, hi, default: float) -> np.ndarray:
    return _interval_reduce(values, lo, hi, default, np.minimum)


def _interval_max(values, lo, hi, default: float) -> np.ndarray:
    return _interval_reduce(values, lo, hi, default, np.maximum)


def _block_dlmin(ep: EncodedPostings, nep: EncodedPostings) -> np.ndarray:
    """Per-posting-block doclen lower bound from norms METADATA only: min of
    ``block_mintf`` over the norms blocks overlapping each posting block's
    [first, last] docID window (a superset window → a valid lower bound).
    One vectorized reduceat pass — metadata-sized, never decodes a norms
    posting."""
    lo = np.searchsorted(nep.block_last, ep.block_first, side="left")
    hi = np.searchsorted(nep.block_first, ep.block_last, side="right")
    return _interval_min(nep.block_mintf, lo, hi, 1.0)


def _score_ub(idf: float, maxtf, dlmin, avgdl: float,
              k1: float, b: float):
    """BM25 score upper bound: tf/(tf+norm) is increasing in tf and
    decreasing in doclen, so (maxtf, dlmin) bounds any posting's score."""
    mt = np.asarray(maxtf, dtype=np.float64)
    return idf * mt * (k1 + 1.0) / (mt + k1 * (1.0 - b + b * dlmin / avgdl))


_WAND_CHUNK = 4  # rare-term blocks decoded per threshold update


def _pop_pseudo_docs(post_pdf: pd.DataFrame, term: str
                     ) -> tuple[pd.DataFrame, np.ndarray | None]:
    """Extract pseudo-postings rows (ALLOW_TERM / DEL_TERM) from a range's
    cogroup rows → (remaining rows, ascending docID array or None). A range
    may carry SEVERAL rows under the same pseudo-term (e.g. tombstones from
    the delete list PLUS a query-scoped MUST_NOT id set) — their doc lists
    union."""
    mask = post_pdf["term"] == term
    if not mask.any():
        return post_pdf, None
    parts = [decode_postings(_ep_from_row(r))[0]
             for r in post_pdf[mask].itertuples()]
    docs = (parts[0] if len(parts) == 1
            else np.unique(np.concatenate(parts)))
    return post_pdf[~mask], docs


def _deny_filter(deny_caches: dict, docs: np.ndarray, *payloads):
    """Drop (sorted) docIDs present in any deny term's postings, decoding
    only deny blocks that contain a candidate (skip-list analog — a deny
    term hot elsewhere in the range costs nothing here). Returns the
    filtered docs plus each payload array filtered the same way."""
    for dc in deny_caches.values():
        if docs.size == 0:
            break
        idxs = dc.overlapping_idx(int(docs[0]), int(docs[-1]))
        if idxs.size == 0:
            continue
        blo = np.searchsorted(docs, dc.ep.block_first[idxs], "left")
        bhi = np.searchsorted(docs, dc.ep.block_last[idxs], "right")
        idxs = idxs[bhi > blo]
        if idxs.size == 0:
            continue
        dd, _ = dc.blocks_concat(idxs)
        m = ~_in_sorted(docs, dd)
        docs = docs[m]
        payloads = tuple(p[m] for p in payloads)
    return (docs, *payloads)


def _make_range_scorer(terms_by_rarity: list[str], idf_by_term: dict[str, float],
                       avgdl: float, k: int, k1: float = BM25_K1,
                       b: float = BM25_B,
                       allow: bool = False, counters: dict | None = None,
                       sentinel_of: dict[str, str] | None = None,
                       avgdl_of: dict[str, float] | None = None,
                       deny: list[str] | None = None,
                       after: tuple | None = None,
                       cache_pool: dict | None = None):
    """cogroup-applyInPandas fn: one (range_id) group of postings rows +
    the range's norms rows → local top-k (doc_id, score), with block-max
    WAND pruning.

    ``cache_pool`` (batched serving): a per-range-invocation dict shared
    by every query's scorer in a ``topk_batch`` pass — postings/norms
    Arrow-rows are materialized and block-decoded once per (term, range),
    not once per (query, range); see ``_pooled``. Implies one shared
    ``counters`` namespace across the pooled scorers.

    Tombstones arrive as DEL_TERM pseudo-postings rows in the same cogroup
    (range-partitioned; see QuerySession.refresh_deletes) and are filtered
    out before selection. ``allow``: require an ALLOW_TERM row per range
    (exact multi-field conjunction) and restrict candidates to its docIDs.

    Per-field scoring (parsed multi-field queries): ``sentinel_of`` maps
    each query term to its norms sentinel (DOCLEN_TERM for content,
    ``<field>:`` for a namespaced metadata term) and ``avgdl_of`` maps each
    sentinel to that field's average length — every term's tf saturation
    then uses ITS field's doclen, like Lucene's per-field norms. Defaults
    reproduce the single-field (content) behavior exactly.
    """
    score_order = sorted(terms_by_rarity)  # deterministic accumulation order
    if sentinel_of is None:
        sentinel_of = {t: DOCLEN_TERM for t in terms_by_rarity}
    if avgdl_of is None:
        avgdl_of = {DOCLEN_TERM: avgdl}
    sentinels = sorted({sentinel_of[t] for t in terms_by_rarity})

    def score_range(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                    ) -> pd.DataFrame:
        empty = _pooled(
            cache_pool, ("empty",),
            lambda: pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                  "score": pd.Series(dtype=np.float64)}))
        if len(norms_pdf) == 0 or len(post_pdf) == 0:
            return empty
        # pooled: all plans of a batch receive the identical group
        # frame, so the tombstone pop runs once per range, not per query
        post_pdf, deletes = _pooled(
            cache_pool, ("popdel",),
            lambda: _pop_pseudo_docs(post_pdf, DEL_TERM))
        allow_docs: np.ndarray | None = None
        if allow:
            post_pdf, allow_docs = _pop_pseudo_docs(post_pdf, ALLOW_TERM)
            if allow_docs is None:
                return empty  # no allowed docs in this range
        by_term = {r.term: _pooled(cache_pool, ("ep", r.term),
                                   lambda r=r: _ep_from_row(r))
                   for r in post_pdf.itertuples()}
        if any(t not in by_term for t in terms_by_rarity):
            return empty  # conjunctive MUST: every term must exist in range
        deny_caches = {dt: _pooled(cache_pool, ("bc", dt),
                                   lambda dt=dt: _BlockCache(by_term[dt],
                                                             counters))
                       for dt in (deny or []) if dt in by_term}
        neps = {r.term: _pooled(cache_pool, ("nep", r.term),
                                lambda r=r: _ep_from_row(r))
                for r in norms_pdf.itertuples()}
        if any(s not in neps for s in sentinels):
            return empty  # no doc in this range carries that field

        rare = terms_by_rarity[0]
        others = terms_by_rarity[1:]
        rep = by_term[rare]
        rcache = _pooled(cache_pool, ("bc", rare),
                         lambda: _BlockCache(rep, counters))
        ocaches = {t: _pooled(cache_pool, ("bc", t),
                              lambda t=t: _BlockCache(by_term[t], counters))
                   for t in others}
        ncaches = {s: _pooled(cache_pool, ("nbc", s),
                              lambda s=s: _BlockCache(neps[s]))
                   for s in sentinels}

        # ---- block-max upper bounds (metadata only) ----
        # per-rare-block doclen lower bounds, one per involved field
        dlmin_by_s = {s: _pooled(cache_pool, ("dlmin", rare, s),
                                 lambda s=s: _block_dlmin(rep, neps[s]))
                      for s in sentinels}
        ub = _score_ub(idf_by_term[rare], rep.block_maxtf,
                       dlmin_by_s[sentinel_of[rare]],
                       avgdl_of[sentinel_of[rare]], k1, b)
        if others:
            # per-rare-block other-term bounds from the OVERLAPPING blocks'
            # block_maxtf (not the range-wide max): tighter for hot
            # conjunctions, and a rare block overlapped by NO block of some
            # MUST term provably holds no conjunctive match at all → pruned
            # outright (ub = -inf)
            alive = np.ones(ub.size, dtype=bool)
            for t in others:
                oep = by_term[t]
                lo = np.searchsorted(oep.block_last, rep.block_first, "left")
                hi = np.searchsorted(oep.block_first, rep.block_last, "right")
                omax = _interval_max(oep.block_maxtf, lo, hi, 0.0)
                has = omax > 0
                alive &= has
                contrib = np.zeros(ub.size, dtype=np.float64)
                dlm = dlmin_by_s[sentinel_of[t]]
                contrib[has] = _score_ub(idf_by_term[t], omax[has],
                                         dlm[has],
                                         avgdl_of[sentinel_of[t]], k1, b)
                ub += contrib
            ub[~alive] = -np.inf

        border = np.argsort(-ub, kind="stable")
        border = border[ub[border] > -np.inf]
        ub_sorted = ub[border]

        res_docs: list[np.ndarray] = []
        res_scores: list[np.ndarray] = []
        n_scored = 0
        threshold = -np.inf
        pos = 0
        while pos < border.size:
            if n_scored >= k and ub_sorted[pos] < threshold:
                break  # bounds are sorted: every remaining block is prunable
            chunk = border[pos:pos + _WAND_CHUNK]
            if n_scored >= k:
                chunk = chunk[ub[chunk] >= threshold]  # keep == (tie-break)
            pos += _WAND_CHUNK
            if chunk.size == 0:
                continue
            parts = [rcache.block(int(i)) for i in chunk]
            cd = np.concatenate([p[0] for p in parts])
            ct = np.concatenate([p[1] for p in parts])
            if chunk.size > 1:
                o = np.argsort(cd)  # chunk blocks are scattered in doc space
                cd, ct = cd[o], ct[o]
            if allow_docs is not None:
                m = _in_sorted(cd, allow_docs)
                cd, ct = cd[m], ct[m]
            if deletes is not None and deletes.size:
                m = ~_in_sorted(cd, deletes)
                cd, ct = cd[m], ct[m]
            if deny_caches:
                cd, ct = _deny_filter(deny_caches, cd, ct)
            if cd.size == 0:
                continue

            # conjunctive intersection, decoding only other-term blocks
            # overlapping this chunk's doc windows (skip-list analog)
            tfs_by_term: dict[str, np.ndarray] = {rare: ct}
            dead = False
            for t in others:
                oc = ocaches[t]
                sel: set[int] = set()
                for i in chunk:
                    lo = int(rep.block_first[int(i)])
                    hi = int(rep.block_last[int(i)])
                    sel.update(int(j) for j in oc.overlapping_idx(lo, hi))
                d2, t2 = oc.blocks_concat(sorted(sel))
                cand_new, i1, i2 = np.intersect1d(
                    cd, d2, assume_unique=True, return_indices=True)
                if cand_new.size == 0:
                    dead = True
                    break
                for prev, arr in tfs_by_term.items():
                    tfs_by_term[prev] = arr[i1]
                tfs_by_term[t] = t2[i2]
                cd = cand_new
            if dead:
                continue

            norm_by_s = {}
            for s in sentinels:
                nc = ncaches[s]
                nd, ntf = nc.blocks_concat(
                    nc.overlapping_idx(int(cd[0]), int(cd[-1])))
                dl = ntf[np.searchsorted(nd, cd)].astype(np.float64)
                norm_by_s[s] = k1 * (1.0 - b + b * dl / avgdl_of[s])
            score = np.zeros(cd.size, dtype=np.float64)
            for t in score_order:
                tf = tfs_by_term[t].astype(np.float64)
                score += (idf_by_term[t] * tf * (k1 + 1.0)
                          / (tf + norm_by_s[sentinel_of[t]]))
            if after is not None:
                # searchAfter: chunk scores are FINAL (full conjunction),
                # so filtering here keeps the WAND threshold sound — θ is
                # the kth best of the FILTERED page, never inflated by
                # docs from earlier pages
                m = _after_mask(cd, score, after)
                cd, score = cd[m], score[m]
                if cd.size == 0:
                    continue
            res_docs.append(cd)
            res_scores.append(score)
            n_scored += cd.size
            if n_scored >= k:
                allsc = np.concatenate(res_scores)
                threshold = float(
                    np.partition(allsc, allsc.size - k)[allsc.size - k])

        if not res_docs:
            return empty
        cand = np.concatenate(res_docs)
        score = np.concatenate(res_scores)
        if cand.size > k:
            # argpartition alone breaks ties arbitrarily; keep EVERY doc tied
            # with the kth score so the lexsort can apply the deterministic
            # (score desc, doc_id asc) tie-break the oracle uses
            part = np.argpartition(-score, k - 1)
            kth = score[part[k - 1]]
            sel2 = np.flatnonzero(score >= kth)
            order = sel2[np.lexsort((cand[sel2], -score[sel2]))][:k]
        else:
            order = np.lexsort((cand, -score))
        return pd.DataFrame({"doc_id": cand[order], "score": score[order]})

    return score_range


# ---------------------------------------------------------------------------
# disjunctive (SHOULD) scorer — vectorized MaxScore
# ---------------------------------------------------------------------------

def _after_mask(cand: np.ndarray, score: np.ndarray,
                after: tuple) -> np.ndarray:
    """searchAfter predicate: keep docs strictly AFTER (score, doc_id) in
    the (score desc, doc_id asc) rank order. The pivot comes from the
    engine's own previous page, so the fp64 equality is exact."""
    s_a, d_a = float(after[0]), int(after[1])
    return (score < s_a) | ((score == s_a) & (cand > d_a))


def _topk_frame(cand: np.ndarray, score: np.ndarray, k: int,
                after: tuple | None = None) -> pd.DataFrame:
    """(score desc, doc_id asc) top-k cut shared by the union and phrase
    scorers: argpartition to the kth score, then lexsort only the head.
    ``after`` applies the searchAfter predicate BEFORE the cut."""
    if after is not None:
        m = _after_mask(cand, score, after)
        cand, score = cand[m], score[m]
    if cand.size > k:
        part = np.argpartition(-score, k - 1)
        kth = score[part[k - 1]]
        sel = np.flatnonzero(score >= kth)
        order = sel[np.lexsort((cand[sel], -score[sel]))][:k]
    else:
        order = np.lexsort((cand, -score))
    return pd.DataFrame({"doc_id": cand[order], "score": score[order]})


def _make_or_range_scorer(terms: list[str], idf_by_term: dict[str, float],
                          avgdl: float, k: int, k1: float = BM25_K1,
                          b: float = BM25_B, allow: bool = False,
                          counters: dict | None = None,
                          sentinel_of: dict[str, str] | None = None,
                          avgdl_of: dict[str, float] | None = None,
                          deny: list[str] | None = None,
                          min_should_match: int = 1,
                          after: tuple | None = None,
                          cache_pool: dict | None = None):
    """cogroup-applyInPandas fn: disjunctive (OR / Lucene ``SHOULD``) BM25 —
    score(d) = Σ over query terms PRESENT in d; any doc matching at least
    one term competes. Beyond the reference wrapper (it only ever emits
    ``Occur.MUST``, SURVEY §2.7 U2) but native to Lucene's query parser and
    a first-class mode for a fulltext engine.

    ``min_should_match`` = Lucene
    ``BooleanQuery.setMinimumNumberShouldMatch``: only docs containing at
    least that many DISTINCT query terms qualify (scores still sum every
    present term). Exactness at scale comes from the pigeonhole rule: a
    qualifying doc must contain one of the ``n - m + 1`` RAREST terms, so
    only those decode fully; the ``m - 1`` hottest terms decode just the
    blocks overlapping surviving candidates (their postings dominate the
    union's cost, and they are exactly the ones skipped).

    Exact top-k with **MaxScore pruning** (Turtle & Flood 1995), batch-
    vectorized to fit this engine's block layout: terms are processed in
    descending range-wide score-upper-bound order; once the top-k threshold
    θ (kth best PARTIAL sum — a valid lower bound of the kth final score)
    exceeds the suffix UB sum of the remaining terms, those terms become
    non-essential: no doc seen only in them can reach the top-k, so they are
    scored ONLY on surviving candidates, decoding ONLY blocks that contain a
    candidate (counters prove skipped blocks, like the conjunctive WAND).
    Candidates whose partial + remaining UB < θ are dropped between terms.
    Tombstones (DEL_TERM) and the exact allowlist (ALLOW_TERM) arrive as
    pseudo-postings rows, same as the conjunctive scorer.
    """
    if sentinel_of is None:
        sentinel_of = {t: DOCLEN_TERM for t in terms}
    if avgdl_of is None:
        avgdl_of = {DOCLEN_TERM: avgdl}

    def score_range(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                    ) -> pd.DataFrame:
        empty = _pooled(
            cache_pool, ("empty",),
            lambda: pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                  "score": pd.Series(dtype=np.float64)}))
        if len(norms_pdf) == 0 or len(post_pdf) == 0:
            return empty
        # pooled: all plans of a batch receive the identical group
        # frame, so the tombstone pop runs once per range, not per query
        post_pdf, deletes = _pooled(
            cache_pool, ("popdel",),
            lambda: _pop_pseudo_docs(post_pdf, DEL_TERM))
        allow_docs: np.ndarray | None = None
        if allow:
            post_pdf, allow_docs = _pop_pseudo_docs(post_pdf, ALLOW_TERM)
            if allow_docs is None:
                return empty
        by_term = {r.term: _pooled(cache_pool, ("ep", r.term),
                                   lambda r=r: _ep_from_row(r))
                   for r in post_pdf.itertuples()}
        neps = {r.term: _pooled(cache_pool, ("nep", r.term),
                                lambda r=r: _ep_from_row(r))
                for r in norms_pdf.itertuples()}
        present = [t for t in terms
                   if t in by_term and sentinel_of[t] in neps]
        if not present:
            return empty
        caches = {t: _pooled(cache_pool, ("bc", t),
                             lambda t=t: _BlockCache(by_term[t], counters))
                  for t in present}
        deny_caches = {dt: _pooled(cache_pool, ("bc", dt),
                                   lambda dt=dt: _BlockCache(by_term[dt],
                                                             counters))
                       for dt in (deny or []) if dt in by_term}
        ncaches = {s: _pooled(cache_pool, ("nbc", s),
                              lambda s=s: _BlockCache(neps[s]))
                   for s in sorted({sentinel_of[t] for t in present})}

        def dl_of(s: str, docs: np.ndarray) -> np.ndarray:
            """doclen per (sorted) docID via the field's norms postings; a
            doc matching a field term always carries that field's norm, but
            fall back to avgdl rather than crash on a malformed index."""
            nc = ncaches[s]
            nd, ntf = nc.blocks_concat(
                nc.overlapping_idx(int(docs[0]), int(docs[-1])))
            dl = np.full(docs.size, avgdl_of[s], dtype=np.float64)
            if nd.size:
                p = np.searchsorted(nd, docs)
                np.clip(p, 0, nd.size - 1, out=p)
                m = nd[p] == docs
                dl[m] = ntf[p[m]]
            return dl

        def bm25(t: str, tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
            norm = k1 * (1.0 - b + b * dl / avgdl_of[sentinel_of[t]])
            return idf_by_term[t] * tf * (k1 + 1.0) / (tf + norm)

        if min_should_match > 1:
            if len(present) < min_should_match:
                return empty  # this range cannot hold a qualifying doc
            # rarest first (idf is monotone-decreasing in df); a doc with
            # >= m present terms must contain one of the n-m+1 rarest
            rare = sorted(present, key=lambda t: (-idf_by_term[t], t))
            n_ess = len(present) - min_should_match + 1
            cand = np.empty(0, dtype=np.int64)
            partial = np.empty(0, dtype=np.float64)
            nmatch = np.empty(0, dtype=np.int64)
            for t in rare[:n_ess]:
                c, ep = caches[t], by_term[t]
                d, tf = c.blocks_concat(np.arange(ep.block_first.size))
                if allow_docs is not None:
                    m = _in_sorted(d, allow_docs)
                    d, tf = d[m], tf[m]
                if deletes is not None and deletes.size:
                    m = ~_in_sorted(d, deletes)
                    d, tf = d[m], tf[m]
                if deny_caches:
                    d, tf = _deny_filter(deny_caches, d, tf)
                if d.size == 0:
                    continue
                contrib = bm25(t, tf.astype(np.float64),
                               dl_of(sentinel_of[t], d))
                comb = np.concatenate([cand, d])
                vals = np.concatenate([partial, contrib])
                ones = np.concatenate(
                    [nmatch, np.ones(d.size, dtype=np.int64)])
                cand, inv = np.unique(comb, return_inverse=True)
                partial = np.zeros(cand.size, dtype=np.float64)
                nmatch = np.zeros(cand.size, dtype=np.int64)
                np.add.at(partial, inv, vals)
                np.add.at(nmatch, inv, ones)
            if cand.size == 0:
                return empty
            for t in rare[n_ess:]:
                # hottest terms: decode only candidate-overlapping blocks
                c, ep = caches[t], by_term[t]
                idxs = c.overlapping_idx(int(cand[0]), int(cand[-1]))
                blo = np.searchsorted(cand, ep.block_first[idxs], "left")
                bhi = np.searchsorted(cand, ep.block_last[idxs], "right")
                idxs = idxs[bhi > blo]
                if idxs.size == 0:
                    continue
                d2, t2 = c.blocks_concat(idxs)
                p = np.searchsorted(d2, cand)
                np.clip(p, 0, d2.size - 1, out=p)
                m = d2[p] == cand
                if not m.any():
                    continue
                partial[m] += bm25(t, t2[p[m]].astype(np.float64),
                                   dl_of(sentinel_of[t], cand[m]))
                nmatch[m] += 1
            qual = nmatch >= min_should_match
            cand, partial = cand[qual], partial[qual]
            if cand.size == 0:
                return empty
            return _topk_frame(cand, partial, k, after)

        # range-wide per-term upper bounds, metadata only
        ub: dict[str, float] = {}
        for t in present:
            ep, nep = by_term[t], neps[sentinel_of[t]]
            lo = int(np.searchsorted(nep.block_last,
                                     ep.block_first[0], "left"))
            hi = int(np.searchsorted(nep.block_first,
                                     ep.block_last[-1], "right"))
            dlmin = float(nep.block_mintf[lo:hi].min()) if hi > lo else 1.0
            ub[t] = float(_score_ub(idf_by_term[t],
                                    float(ep.block_maxtf.max()), dlmin,
                                    avgdl_of[sentinel_of[t]], k1, b))
        order = sorted(present, key=lambda t: (-ub[t], t))
        suffix = np.cumsum([ub[t] for t in order][::-1])[::-1]

        cand = np.empty(0, dtype=np.int64)
        partial = np.empty(0, dtype=np.float64)
        threshold = -np.inf

        for i, t in enumerate(order):
            rem = float(suffix[i])  # UB of t plus every later term
            if np.isfinite(threshold) and cand.size:
                keep = partial + rem >= threshold
                cand, partial = cand[keep], partial[keep]
            c = caches[t]
            ep = by_term[t]
            if not (np.isfinite(threshold) and rem < threshold):
                # essential: every posting of t is a potential candidate
                d, tf = c.blocks_concat(np.arange(ep.block_first.size))
                if allow_docs is not None:
                    m = _in_sorted(d, allow_docs)
                    d, tf = d[m], tf[m]
                if deletes is not None and deletes.size:
                    m = ~_in_sorted(d, deletes)
                    d, tf = d[m], tf[m]
                if deny_caches:
                    # candidates only ever enter through this branch, so
                    # denying here covers the whole union
                    d, tf = _deny_filter(deny_caches, d, tf)
                if d.size == 0:
                    continue
                contrib = bm25(t, tf.astype(np.float64),
                               dl_of(sentinel_of[t], d))
                comb = np.concatenate([cand, d])
                vals = np.concatenate([partial, contrib])
                cand, inv = np.unique(comb, return_inverse=True)
                partial = np.zeros(cand.size, dtype=np.float64)
                np.add.at(partial, inv, vals)
            else:
                # non-essential: may only raise EXISTING candidates — decode
                # only blocks holding at least one candidate (the skip)
                if cand.size == 0:
                    continue
                idxs = c.overlapping_idx(int(cand[0]), int(cand[-1]))
                blo = np.searchsorted(cand, ep.block_first[idxs], "left")
                bhi = np.searchsorted(cand, ep.block_last[idxs], "right")
                idxs = idxs[bhi > blo]
                if idxs.size == 0:
                    continue
                d2, t2 = c.blocks_concat(idxs)
                p = np.searchsorted(d2, cand)
                np.clip(p, 0, d2.size - 1, out=p)
                m = d2[p] == cand
                if not m.any():
                    continue
                partial[m] += bm25(t, t2[p[m]].astype(np.float64),
                                   dl_of(sentinel_of[t], cand[m]))
            if after is None and cand.size >= k:
                # searchAfter disables MaxScore thresholding: θ from
                # UNFILTERED partials can exceed the filtered page's kth
                # final score (a doc destined for an earlier page inflates
                # it), which would over-prune — with `after` the union is
                # scored in full and the predicate applies at the cut
                threshold = float(np.partition(
                    partial, partial.size - k)[partial.size - k])

        if cand.size == 0:
            return empty
        return _topk_frame(cand, partial, k, after)

    return score_range


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein DP: returns the distance, or cap+1 as soon as a
    full row exceeds ``cap`` (early exit). O(len·cap) per pair — used only
    on the length-prefiltered sliver of a PINNED driver-side dictionary;
    the distributed path uses the JVM's F.levenshtein."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = cap + 1
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
            lo = min(lo, cur[j])
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[lb]


# ---------------------------------------------------------------------------
# match-set (no scoring) — the facet/count substrate
# ---------------------------------------------------------------------------

def _make_range_matcher(terms: list[str], conjunctive: bool,
                        deny: list[str] | None = None):
    """grouped-map fn: ALL matching docIDs of one range — intersection
    (MUST) or union (SHOULD), no norms, no scores. Lucene's collector
    analog for faceting/counting. Tombstones (DEL_TERM pseudo rows) and
    deny terms are anti-joined. Decode discipline: a conjunction fully
    decodes only the rarest term; every other term (and every deny term)
    decodes only blocks holding a surviving candidate."""

    def match_range(_key, pdf):
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64)})
        if len(pdf) == 0:
            return empty
        pdf, deletes = _pop_pseudo_docs(pdf, DEL_TERM)
        by_term = {r.term: _ep_from_row(r) for r in pdf.itertuples()}
        present = [t for t in terms if t in by_term]
        if not present or (conjunctive and len(present) < len(terms)):
            return empty
        deny_caches = {dt: _BlockCache(by_term[dt])
                       for dt in (deny or []) if dt in by_term}
        if conjunctive:
            order = sorted(present, key=lambda t: (by_term[t].n, t))
            rc = _BlockCache(by_term[order[0]])
            d, _ = rc.blocks_concat(
                np.arange(by_term[order[0]].block_first.size))
            for t in order[1:]:
                if d.size == 0:
                    break
                ep = by_term[t]
                oc = _BlockCache(ep)
                idxs = oc.overlapping_idx(int(d[0]), int(d[-1]))
                blo = np.searchsorted(d, ep.block_first[idxs], "left")
                bhi = np.searchsorted(d, ep.block_last[idxs], "right")
                d2, _ = oc.blocks_concat(idxs[bhi > blo])
                d = d[_in_sorted(d, d2)]
        else:
            d = np.unique(np.concatenate(
                [_BlockCache(by_term[t]).blocks_concat(
                    np.arange(by_term[t].block_first.size))[0]
                 for t in present]))
        if deletes is not None and deletes.size and d.size:
            d = d[~_in_sorted(d, deletes)]
        if deny_caches and d.size:
            (d,) = _deny_filter(deny_caches, d)
        if d.size == 0:
            return empty
        return pd.DataFrame({"doc_id": d})

    return match_range


# ---------------------------------------------------------------------------
# phrase scorer (positional)
# ---------------------------------------------------------------------------

_POS_SHIFT = np.int64(1) << np.int64(32)  # doc-ordinal • position packing


#: one "whole words" clause: (analyzed token sequence — namespaced for
#: metadata fields, with duplicates, in order; deduped terms; the field's
#: doclen sentinel term; the field's avgdl)
def _fuzzy_boosts(query: str,
                  pairs: list[tuple[str, int]]) -> dict[str, float]:
    """Lucene FuzzyQuery similarity boosts: 1 − dist/min(|query|, |term|)
    (``FuzzyTermsEnum``, prefixLength=0). An exact match (dist 0) keeps
    weight 1; a 1-edit expansion of a 5-char query weighs 0.8."""
    return {t: 1.0 - d / min(len(query), len(t)) for t, d in pairs}


PhraseClause = tuple[list[str], list[str], str, float]


def _make_phrase_scorer(clauses: list[PhraseClause],
                        idf_by_term: dict[str, float], k: int,
                        k1: float = BM25_K1, b: float = BM25_B,
                        allow: bool = False,
                        slop: int | list[int] = 0,
                        phrase_freq: bool = False,
                        after: tuple | None = None,
                        boosts: list[float] | None = None,
                        occurs: list[str] | None = None):
    """cogroup fn for phrase ("whole words") mode — one PhraseQuery per
    field, MUST-conjoined, clause scores summed (reference ``BooleanQuery``
    of per-field ``PhraseQuery`` clauses, ``cLuceneIndexReader.java:
    285-301``). Per range: intersect every clause's terms' doc lists, then
    verify each clause's consecutive-position chain entirely with sorted-key
    set operations on the delta-decoded (per-field) positions. Each clause
    is scored as the conjunctive BM25 of its constituent terms with ITS
    field's norms (documented deviation from Lucene's phrase-freq scoring;
    the oracle pins the same definition).

    ``slop > 0`` switches every clause to Lucene ``SpanNearQuery``
    (inOrder=true) semantics: the clause matches where its terms occur at
    strictly increasing positions p_1 < … < p_n with total slack
    ``p_n - p_1 - (n-1) <= slop``. Existence is decided by a greedy
    earliest-next chain per start occurrence (for a fixed start, taking the
    smallest admissible next position minimizes the end position, hence the
    span — so the greedy chain finds a witness iff one exists), vectorized
    as one ``searchsorted`` per query term over the packed
    (doc-ordinal << 32 | position) keys. A list-valued ``slop`` sets a
    per-clause slack (query-string mode: each quoted phrase carries its
    own ``~N``).

    ``phrase_freq=True`` switches to TRUE Lucene ``PhraseQuery`` scoring:
    each clause scores with tf = its per-doc phrase frequency and idf =
    the sum of its terms' idfs over the FULL token sequence (Lucene
    ``PhraseWeight`` sums per occurrence, so a repeated term counts
    twice) — closing the round-1 documented deviation. With ``slop == 0``
    the frequency is the occurrence count (one per start position
    completing the chain); with ``slop > 0`` it is Lucene's sloppy
    frequency Σ ``1/(1 + matchLength)`` over the minimal spans — one per
    start occurrence whose greedy earliest-next chain completes within
    the slack, ``matchLength = span - (n-1)`` the slack that span
    consumed (``SloppyPhraseScorer.sloppyFreq``; our span enumeration is
    the greedy minimal span per start, pinned by the from-scratch
    recompute test and the DuckDB oracle).

    ``boosts`` (one float per clause) scales each clause's score — Lucene
    ``^boost`` on a quoted phrase (``"a b"^2``) multiplies that
    PhraseQuery's contribution.

    ``occurs`` (round 4 — one of "+"/"" per clause, default all "+"):
    exact Lucene ``BooleanQuery`` occur semantics across clauses. MUST
    ("+") clauses intersect — the match set is their conjunction; SHOULD
    ("") clauses are scoring-only riders that contribute where they match
    (with no MUST clause, the match set is the SHOULD union). SHOULD
    clauses position-verify only over the MUST candidate set (they can
    never add matches), and a SHOULD clause whose terms are absent from
    a range is inert there rather than emptying it."""
    slops = (list(slop) if isinstance(slop, (list, tuple))
             else [slop] * len(clauses))
    assert len(slops) == len(clauses)
    assert boosts is None or len(boosts) == len(clauses)
    occs = list(occurs) if occurs is not None else ["+"] * len(clauses)
    assert len(occs) == len(clauses)
    must_idx = [ci for ci in range(len(clauses)) if occs[ci] == "+"]
    should_idx = [ci for ci in range(len(clauses)) if occs[ci] != "+"]
    must_terms = list(dict.fromkeys(
        t for ci in must_idx for t in clauses[ci][1]))
    _no_docs = np.empty(0, dtype=np.int64)
    _no_pf = np.empty(0, dtype=np.float64)

    def score_range(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                    ) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "score": pd.Series(dtype=np.float64)})
        if len(norms_pdf) == 0 or len(post_pdf) == 0:
            return empty
        post_pdf, deletes = _pop_pseudo_docs(post_pdf, DEL_TERM)
        allow_docs: np.ndarray | None = None
        if allow:
            post_pdf, allow_docs = _pop_pseudo_docs(post_pdf, ALLOW_TERM)
            if allow_docs is None:
                return empty
        rows = {r.term: r for r in post_pdf.itertuples()}
        if any(t not in rows for t in must_terms):
            return empty
        nrows = {r.term: r for r in norms_pdf.itertuples()}
        if any(clauses[ci][2] not in nrows for ci in must_idx):
            return empty
        dec: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

        def decode(t: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            if t not in dec:
                r = rows[t]
                if r.pos_enc is None:
                    raise ValueError(
                        "index was built without positions=True")
                d, tf = decode_postings(_ep_from_row(r))
                dec[t] = (d, tf, positions_decode(bytes(r.pos_enc), tf))
            return dec[t]

        def filt(d: np.ndarray) -> np.ndarray:
            if allow_docs is not None:
                d = d[_in_sorted(d, allow_docs)]
            if deletes is not None and deletes.size:
                d = d[~_in_sorted(d, deletes)]
            return d

        def verify(ci: int, base: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
            """(matched docs asc, per-doc pf) of clause ci over the
            candidate docs ``base``: greedy earliest-next chain per start
            occurrence, vectorized as one searchsorted per query term over
            the packed (candidate-ordinal << 32 | position) keys."""
            seq = clauses[ci][0]
            cl_slop = slops[ci]
            keysets: dict[str, np.ndarray] = {}
            for t in set(seq):
                d, tf, pos = decode(t)
                m = _in_sorted(d, base)
                lens_c = tf[m]
                offs = np.cumsum(tf) - tf
                total = int(lens_c.sum())
                starts_new = np.cumsum(lens_c) - lens_c
                idx = (np.arange(total, dtype=np.int64)
                       - np.repeat(starts_new, lens_c)
                       + np.repeat(offs[m], lens_c))
                p = pos[idx]
                dkey = np.repeat(
                    np.searchsorted(base, d[m]).astype(np.int64), lens_c)
                keysets[t] = dkey * _POS_SHIFT + p  # ascending by constr.
            if cl_slop == 0:
                live = keysets[seq[0]]
                for i in range(1, len(seq)):
                    live = live[_in_sorted(live + np.int64(i),
                                           keysets[seq[i]])]
                    if live.size == 0:
                        return _no_docs, _no_pf
                weights = np.ones(live.size, dtype=np.float64)
            else:
                start = keysets[seq[0]]
                cur = start
                ok = np.ones(cur.size, dtype=bool)
                for i in range(1, len(seq)):
                    ks = keysets[seq[i]]
                    idx = np.searchsorted(ks, cur, side="right")
                    valid = idx < ks.size
                    nxt = ks[np.minimum(idx, ks.size - 1)]
                    ok &= valid & ((nxt // _POS_SHIFT)
                                   == (cur // _POS_SHIFT))
                    cur = np.where(ok, nxt, cur)
                    if not ok.any():
                        return _no_docs, _no_pf
                span = cur - start               # end pos - start pos
                ok &= span <= np.int64(cl_slop + len(seq) - 1)
                live = start[ok]
                if live.size == 0:
                    return _no_docs, _no_pf
                # Lucene sloppyFreq: each minimal span contributes
                # 1 / (1 + matchLength), matchLength = slack consumed
                mlen = (span[ok]
                        - np.int64(len(seq) - 1)).astype(np.float64)
                weights = 1.0 / (1.0 + mlen)
            ords_all = live // _POS_SHIFT
            ords, inv = np.unique(ords_all, return_inverse=True)
            pf = np.bincount(inv, weights=weights)
            return base[ords], pf

        matches: list[tuple[np.ndarray, np.ndarray] | None] = (
            [None] * len(clauses))
        cand: np.ndarray | None = None
        if must_idx:
            # docs containing EVERY term of EVERY MUST clause, then each
            # MUST clause position-verifies over the shrinking set
            cand = decode(must_terms[0])[0]
            for t in must_terms[1:]:
                cand = np.intersect1d(cand, decode(t)[0],
                                      assume_unique=True)
                if cand.size == 0:
                    return empty
            cand = filt(cand)
            if cand.size == 0:
                return empty
            for ci in must_idx:
                docs_m, pf = verify(ci, cand)
                if docs_m.size == 0:
                    return empty
                matches[ci] = (docs_m, pf)
                cand = docs_m
        for ci in should_idx:
            # scoring-only riders: absent terms/sentinel make the clause
            # inert in this range; with MUSTs present, verify only over
            # the MUST candidates (non-candidates can never surface)
            _, td, sent, _ = clauses[ci]
            if any(t not in rows for t in td) or sent not in nrows:
                continue
            base = decode(td[0])[0]
            for t in td[1:]:
                base = np.intersect1d(base, decode(t)[0],
                                      assume_unique=True)
            if cand is not None:
                base = base[_in_sorted(base, cand)]
            base = filt(base)
            if base.size == 0:
                continue
            docs_m, pf = verify(ci, base)
            if docs_m.size:
                matches[ci] = (docs_m, pf)
        if must_idx:
            match_docs = cand
        else:
            arrs = [m[0] for m in matches if m is not None]
            if not arrs:
                return empty
            match_docs = np.unique(np.concatenate(arrs))
        assert match_docs is not None and match_docs.size

        score = np.zeros(match_docs.size, dtype=np.float64)
        for ci, (seq_full, terms_dedup, sentinel, avgdl) in enumerate(
                clauses):
            m = matches[ci]
            if m is None:
                continue
            docs_all, pf_all = m
            sel = _in_sorted(docs_all, match_docs)
            docs_c = docs_all[sel]
            if docs_c.size == 0:
                continue
            out_pos = np.searchsorted(match_docs, docs_c)
            cl_boost = boosts[ci] if boosts is not None else 1.0
            nep = _ep_from_row(nrows[sentinel])
            nd, ntf = decode_blocks_overlapping(
                nep, int(docs_c[0]), int(docs_c[-1]))
            dl = ntf[np.searchsorted(nd, docs_c)].astype(np.float64)
            norm = k1 * (1.0 - b + b * dl / avgdl)
            if phrase_freq:
                # Lucene PhraseWeight: tf = phrase (sloppy) frequency,
                # idf = Σ idf over the clause's FULL token sequence — a
                # repeated term counts once per occurrence (ADVICE r3)
                tfv = pf_all[sel]
                idf_cl = sum(idf_by_term[t] for t in seq_full)
                score[out_pos] += (cl_boost * idf_cl * tfv * (k1 + 1.0)
                                   / (tfv + norm))
            else:
                for t in sorted(terms_dedup):
                    d, tf, _ = decode(t)
                    tfv = tf[np.searchsorted(d, docs_c)
                             ].astype(np.float64)
                    score[out_pos] += (cl_boost * idf_by_term[t] * tfv
                                       * (k1 + 1.0) / (tfv + norm))

        return _topk_frame(match_docs, score, k, after)

    return score_range


def _pseudo_rows_df(ids: DataFrame, range_size: int,
                    term: str) -> DataFrame:
    """Encode a (doc_id) DataFrame into per-range POSTINGS_SCHEMA rows under
    a pseudo-term (ALLOW_TERM allowlist / DEL_TERM tombstones), ready to
    union into the scorer cogroup. The shuffle is O(listed docs),
    range-partitioned like the index itself — nothing reaches the driver."""

    def gen(key, pdf):
        d = np.unique(pdf["doc_id"].to_numpy(np.int64))
        ep = encode_postings(d, np.ones(d.size, dtype=np.int64))
        return pd.DataFrame([{
            "term": term, "range_id": int(key[0]), "df": int(ep.n),
            "cf": int(ep.n), "max_tf": 1,
            "block_first": ep.block_first.tolist(),
            "block_last": ep.block_last.tolist(),
            "block_maxtf": ep.block_maxtf.tolist(),
            "block_mintf": ep.block_mintf.tolist(),
            "block_n": ep.block_n.tolist(),
            "block_off_d": ep.block_off_d.tolist(),
            "block_off_t": ep.block_off_t.tolist(),
            "docs_enc": ep.docs_enc, "tfs_enc": ep.tfs_enc, "pos_enc": None,
        }])

    return (ids
            .withColumn("range_id",
                        (F.col("doc_id") / F.lit(range_size)).cast("long"))
            .groupBy("range_id").applyInPandas(gen, POSTINGS_SCHEMA))


def _allow_rows_df(allow: DataFrame, range_size: int) -> DataFrame:
    return _pseudo_rows_df(allow, range_size, ALLOW_TERM)


class QuerySession:
    """Long-lived query serving session: postings/norms/term-stats loaded once
    and optionally cached in memory. The reference reopens its IndexReader on
    every query (``cIndex.java:134-137``) — we instead serve from a cached
    DataFrame (SURVEY.md §3.2 Spark shape) for p50 latency. Delete tombstones
    are encoded once as range-partitioned DEL_TERM pseudo-postings (refresh
    with ``refresh_deletes``) and cogrouped into every query path's scorer —
    never collected to the driver, never serialized into task closures."""

    def __init__(self, spark: SparkSession, root: str, cache: bool = False,
                 cache_partitions: int | None = None):
        self.spark = spark
        self.root = root
        self.meta = load_meta(spark, root)
        self.paths = IndexPaths(root)
        self.post = spark.read.parquet(self.paths.postings)
        # norms = the DOCLEN_TERM posting rows (tf==doclen) plus the
        # per-field "<field>:" sentinels when metadata fields are indexed
        self._cached = cache
        self._stats_local: dict[str, tuple[int, int]] | None = None
        if cache:
            # Cache CO-PARTITIONED on range_id (the key every scorer
            # cogroups on) and pre-sorted on it: the cached relation's
            # hash-partitioning + ordering satisfy the cogroup's required
            # distribution and sort, so a query plan is ONE stage — an
            # in-memory scan feeding FlatMapCoGroupsInPandas directly, no
            # exchange, no per-query shuffle write/read. ``cache_partitions``
            # models serving-cluster width (N vs 4N task slots); defaults to
            # the session's shuffle parallelism.
            nparts = cache_partitions or int(
                spark.conf.get("spark.sql.shuffle.partitions", "32"))
            self.post = (self.post
                         .repartition(nparts, "range_id")
                         .sortWithinPartitions("range_id", "term"))
        # norms get their OWN relation lineage (a fresh read, NOT a filter
        # over self.post): every scorer COGROUPS post with norms, and a
        # cogroup whose sides descend from the same relation trips Spark's
        # self-join dedup — the right side is rewritten to fresh expr IDs
        # while the UDF's argument list keeps the left's, so downstream
        # column pruning (anything but a bare collect, e.g. .count() or a
        # projection) strips the norms child to its grouping key and the
        # scorer crashes on the missing columns. Distinct relations have
        # distinct expr IDs; nothing to mis-dedup. Physically identical:
        # both sides were separate pushdown-filtered scans anyway.
        self.norms = spark.read.parquet(self.paths.postings).filter(
            (F.col("term") == DOCLEN_TERM) | F.col("term").endswith(":"))
        if cache:
            self.norms = (self.norms
                          .repartition(nparts, "range_id")
                          .sortWithinPartitions("range_id", "term"))
        self.stats = spark.read.parquet(self.paths.term_stats)
        self.refresh_deletes()
        if cache:
            # cache the metadata-heavy small tables fully; postings cached
            # column-pruned (the binary blobs dominate — keep them too: the
            # whole index is the working set of a serving node)
            self.post = self.post.persist()
            self.norms = self.norms.persist()
            self.stats = self.stats.persist()
            self.post.count()
            self.norms.count()
            n_terms = self.stats.count()
            if n_terms <= 200_000:
                # dictionary-sized vocab: pin (term → df, cf) on the driver
                # and save one Spark job per query; huge vocabularies keep
                # the pushdown-filtered distributed lookup
                self._stats_local = {r["term"]: (int(r["df"]), int(r["cf"]))
                                     for r in self.stats.collect()}

    _docmap_df: DataFrame | None = None

    def docmap(self) -> DataFrame:
        """ONE docmap relation reused across calls (VERDICT r3 #9:
        facet/browse/highlight/MLT/range clauses each re-read the parquet
        per call). In a cached QuerySession the docmap is part of the
        serving working set and is persisted alongside the postings.
        NOTE: an external docmap append invalidates Spark's cached
        file-source relation automatically, so staleness follows the same
        session rules as self.post."""
        if self._docmap_df is None:
            import os as _os
            self._docmap_df = self.spark.read.parquet(
                _os.path.join(self.root, "docmap"))
            if self._cached:
                self._docmap_df = self._docmap_df.persist()
        return self._docmap_df

    def _stats_lookup(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """(term → (df, cf)) for query terms / field sentinels: driver dict
        when pinned, else a pushdown-filtered scan of term_stats."""
        if self._stats_local is not None:
            return {t: self._stats_local[t] for t in terms
                    if t in self._stats_local}
        rows = self.stats.filter(F.col("term").isin(terms)).collect()
        return {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}

    def _df_lookup(self, terms: list[str]) -> dict[str, int]:
        return {t: dc[0] for t, dc in self._stats_lookup(terms).items()}

    def _avgdl_by_sentinel(self, sentinels: list[str]) -> dict[str, float]:
        """Per-field average length: content from corpus_stats; a metadata
        field from its sentinel's term_stats row (cf = Σ field doclen,
        df = docs with the field) — Lucene's avgFieldLength convention."""
        fields = [s for s in sentinels if s != DOCLEN_TERM]
        fstats = self._stats_lookup(fields) if fields else {}
        out: dict[str, float] = {}
        for s in sentinels:
            if s == DOCLEN_TERM:
                out[s] = self.meta.avgdl
            else:
                df, cf = fstats.get(s, (0, 0))
                out[s] = (cf / df) if df else 1.0
        return out

    def refresh_deletes(self) -> None:
        """(Re)load the tombstone list as DEL_TERM pseudo-postings, ready to
        union into scorer cogroups. ``None`` when the index has no delete
        list on disk (the common case — zero overhead then)."""
        from ..ops.maintenance import delete_list_path, read_deletes
        import os as _os
        if not _os.path.exists(delete_list_path(self.root)):
            self.del_rows: DataFrame | None = None
            return
        self.del_rows = _pseudo_rows_df(
            read_deletes(self.spark, self.root),
            self.meta.range_size, DEL_TERM)
        if self._cached:
            self.del_rows = self.del_rows.persist()
            self.del_rows.count()

    def _with_deletes(self, post: DataFrame) -> DataFrame:
        """Union the DEL_TERM pseudo-rows (if any) into a scorer input."""
        if self.del_rows is None:
            return post
        return post.unionByName(self.del_rows)

    def close(self) -> None:
        if self._cached:
            for df in (self.post, self.norms, self.stats, self.del_rows,
                       self._docmap_df):
                if df is not None:
                    df.unpersist()

    def topk(self, query: str, k: int = 10, mode: str = "and",
             allow: DataFrame | None = None,
             must_not: str | None = None, slop: int = 0,
             after: tuple | None = None,
             min_should_match: int = 1,
             phrase_scoring: str = "terms") -> DataFrame:
        """Top-k BM25. ``mode``: "and" (MUST intersection, block-max WAND),
        "or" (SHOULD union, MaxScore — any doc matching ≥1 term competes;
        Lucene-parser default, beyond the reference wrapper's MUST-only
        surface), or "phrase". ``allow``: optional (doc_id) DataFrame
        restricting results to an exact candidate set (multi-field
        conjunction) — encoded as per-range ALLOW_TERM pseudo-postings and
        intersected inside the scorer, so the k results are exact, not an
        over-fetch. ``must_not``: MUST_NOT clause text (Lucene ``-term``):
        its analyzed terms exclude any doc containing them, anti-joined
        inside the scorer ("and"/"or" modes; in phrase mode the deny
        match set rides the DEL_TERM pseudo-postings channel). ``slop``
        (phrase mode only)
        relaxes the phrase to Lucene ``SpanNearQuery`` (inOrder=true)
        semantics: terms in order within total slack ``slop``; 0 keeps the
        exact consecutive ``PhraseQuery``. ``min_should_match`` ("or" mode
        only, Lucene ``BooleanQuery.setMinimumNumberShouldMatch``): only
        docs containing at least that many distinct query terms qualify;
        more terms than exist in the corpus-present query can match
        nothing. ``phrase_scoring`` (phrase mode only): "terms" scores the
        phrase's constituent terms conjunctively (round-1 documented
        deviation, kept as the default the oracles pin); "phrase_freq" is
        TRUE Lucene PhraseQuery scoring — tf = per-doc phrase occurrence
        count (slop=0) or Lucene's sloppyFreq Σ 1/(1+matchLength) over
        minimal spans (slop>0), idf = term idfs summed per occurrence.
        ``after`` = Lucene ``IndexSearcher.searchAfter`` (deep
        pagination): a (score, doc_id) pivot — pass the previous page's
        last hit — and the k results strictly after it in (score desc,
        doc_id asc) rank order return, exactly. The filter applies inside
        the range scorers BEFORE their per-range cut, so no page depth
        over-fetches; conjunctive WAND keeps full block pruning (chunk
        scores are final before θ updates), "or" mode scores the union in
        full (an unfiltered MaxScore θ could exceed the filtered page's
        kth score and over-prune)."""
        terms = query_terms(query)
        deny = query_terms(must_not) if must_not else []
        if not terms:
            return self.spark.createDataFrame([], "doc_id long, score double")
        if slop and mode != "phrase":
            raise ValueError("slop applies to phrase mode only")
        if min_should_match > 1 and mode != "or":
            raise ValueError("min_should_match applies to or mode only")
        if phrase_scoring not in ("terms", "phrase_freq"):
            raise ValueError(f"unknown phrase_scoring: {phrase_scoring!r}")
        if phrase_scoring != "terms" and mode != "phrase":
            raise ValueError("phrase_scoring applies to phrase mode only")
        if min_should_match > len(set(terms)):
            return self.spark.createDataFrame([], "doc_id long, score double")
        if deny and mode != "or" and set(terms) & set(deny):
            # a term both MUST and MUST_NOT can match nothing (Lucene
            # BooleanQuery semantics)
            return self.spark.createDataFrame([], "doc_id long, score double")
        if deny and mode == "or":
            terms = [t for t in terms if t not in set(deny)]
            if not terms:
                return self.spark.createDataFrame(
                    [], "doc_id long, score double")
        if mode == "phrase":
            df_by_term = self._df_lookup(terms)
            if any(t not in df_by_term for t in terms):
                return self.spark.createDataFrame(
                    [], "doc_id long, score double")
            idf = {t: _idf(self.meta.n_docs, df_by_term[t]) for t in terms}
            # must_not in phrase mode (round 4): the deny terms' match
            # union compiles to a doc-id set riding the DEL_TERM channel
            deny_ids = (self._match_terms(deny, conjunctive=False)
                        if deny else None)
            return self._phrase_topk(
                query, terms, idf, k, allow, slop=slop,
                phrase_freq=(phrase_scoring == "phrase_freq"),
                after=after, deny_ids=deny_ids)
        return self._score_terms(terms, k, allow,
                                 conjunctive=(mode != "or"),
                                 deny=deny or None,
                                 min_should_match=min_should_match,
                                 after=after)

    def topk_parsed(self, field_queries: dict[str, str], k: int = 10,
                    allow: DataFrame | None = None,
                    op: str = "and") -> DataFrame:
        """Parsed multi-field search (reference ``MultiFieldQueryParser``
        path, ``cLuceneIndexReader.java:320-338``): each clause's text is
        ANALYZED with the pinned code-aware tokenizer and matched against
        that field's namespaced index terms — so ``{"path": "parseJson"}``
        matches camelCase path components by token, not substring — and all
        clauses contribute to ONE conjunctive BM25 score with per-field
        norms (each term's tf saturates against its own field's doclen and
        avgdl). ``op="or"`` switches to SHOULD-union semantics (Lucene
        parser default operator). Requires the index to have been built
        with ``field_cols``.
        """
        terms: list[str] = []
        for field, text in field_queries.items():
            toks = query_terms(text or "")
            if field in ("", "content"):
                terms.extend(toks)
            else:
                terms.extend(f"{field}:{t}" for t in toks)
        terms = list(dict.fromkeys(terms))
        if not terms:
            return self.spark.createDataFrame([], "doc_id long, score double")
        return self._score_terms(terms, k, allow,
                                 conjunctive=(op != "or"))

    def _collect_range_ids(self, post: DataFrame,
                           terms: list[str]) -> list[int]:
        """Distinct range_ids holding any query-term postings row — only
        called when the df-derived bound says the list is small (see
        RANGE_PRUNE_MAX); tests monkeypatch this to prove hot terms never
        reach the driver."""
        return [int(r["range_id"]) for r in
                post.filter(F.col("term").isin(terms))
                .select("range_id").distinct().collect()]

    def _score_terms(self, terms: list[str], k: int | None,
                     allow: DataFrame | None = None,
                     conjunctive: bool = True,
                     deny: list[str] | None = None,
                     min_should_match: int = 1,
                     boosts: dict[str, float] | None = None,
                     after: tuple | None = None,
                     deny_ids: DataFrame | None = None) -> DataFrame:
        """Shared BM25 scorer over (possibly namespaced) terms:
        ``conjunctive`` picks MUST-intersection (WAND) vs SHOULD-union
        (MaxScore) semantics; ``deny`` terms (MUST_NOT) exclude any doc
        containing them, anti-joined inside the scorer via candidate-pruned
        block decodes; ``deny_ids`` is the generalized MUST_NOT channel —
        a (doc_id) DataFrame (deny phrase / range / structured-group match
        set) encoded as extra DEL_TERM pseudo-postings that union with the
        index tombstones inside the scorer. Everything else — bucket/range
        pruning, tombstones, allowlist, per-field norms — is identical.

        ``k=None`` = score-ALL mode (grouping / dismax substrate): every
        matching doc emits its exact score and the frame returns unsorted
        and uncut. A range holds at most ``range_size`` docs, so a per-range
        cut of ``range_size + 1`` provably never triggers — the WAND /
        MaxScore threshold stays −inf and block pruning degrades to the
        structural no-overlap prune only, which never drops a match."""
        spark = self.spark
        meta = self.meta
        k_cut = k if k is not None else meta.range_size + 1
        empty = spark.createDataFrame([], "doc_id long, score double")
        df_by_term = self._df_lookup(terms)
        if conjunctive:
            if any(t not in df_by_term for t in terms):
                return empty  # a MUST term absent from the corpus
        else:
            terms = [t for t in terms if t in df_by_term]
            if not terms:
                return empty  # no SHOULD term exists in the corpus
        # deny terms absent from the corpus exclude nothing
        deny = ([t for t in deny if t in self._df_lookup(deny)]
                if deny else [])
        sentinel_of = {
            t: (t.split(":", 1)[0] + ":" if ":" in t else DOCLEN_TERM)
            for t in terms}
        sentinels = sorted({sentinel_of[t] for t in terms})
        idf_by_term = {t: _idf(meta.n_docs, df_by_term[t]) for t in terms}
        if boosts:
            # Lucene ^boost: scale the term's weight. The WAND / MaxScore
            # upper bounds derive from idf_by_term, so pruning stays exact
            # under boosted weights for free.
            idf_by_term = {t: v * boosts.get(t, 1.0)
                           for t, v in idf_by_term.items()}
        avgdl_of = self._avgdl_by_sentinel(sentinels)
        terms_by_rarity = sorted(terms, key=lambda t: (df_by_term[t], t))

        fetch = terms + deny
        if self._cached:
            # in-memory scan: bucket pruning buys nothing, and skipping the
            # ranges-collect saves a whole Spark job per query
            post = self.post.filter(F.col("term").isin(fetch))
            norms = self.norms.filter(F.col("term").isin(sentinels))
        else:
            # disk path: bucket pruning = parquet partition pruning; the
            # ranges filter keeps the cogroup from touching norms (and deny
            # postings) of ranges where no query term occurs
            bmap = _buckets_of(fetch + sentinels, meta.n_buckets, spark)
            buckets = sorted({bmap[t] for t in fetch})
            post = self.post.filter(F.col("bucket").isin(buckets)
                                    & F.col("term").isin(fetch))
            norms = self.norms.filter(
                F.col("bucket").isin(sorted({bmap[s] for s in sentinels}))
                & F.col("term").isin(sentinels))
            # Range pruning is BOUNDED (VERDICT r3 wrong #1): the candidate
            # range count is upper-bounded by the rarest term's df (MUST:
            # every candidate range holds >= 1 doc with every term) or the
            # summed dfs (SHOULD), capped by the total range count. Only
            # when that bound fits RANGE_PRUNE_MAX is the distinct-range
            # set collected and pushed back as an isin — for a hot term at
            # 10^12-doc scale the old unconditional collect materialized
            # ~n_ranges ints on the driver and compiled a multi-million-
            # element isin, on exactly the queries that are already
            # expensive, while pruning bought almost nothing (the term
            # touches most ranges anyway). Unpruned ranges cost one empty
            # scorer invocation each (the cogroup emits nothing for a
            # range with no query-term postings).
            total_ranges = max(
                1, (meta.n_docs + meta.range_size - 1) // meta.range_size)
            df_bound = (min(df_by_term[t] for t in terms) if conjunctive
                        else sum(df_by_term[t] for t in terms))
            if min(df_bound, total_ranges) <= RANGE_PRUNE_MAX:
                ranges = self._collect_range_ids(post, terms)
                if not ranges:
                    return empty
                if deny:
                    post = post.filter(F.col("range_id").isin(ranges))
                norms = norms.filter(F.col("range_id").isin(ranges))

        post = self._with_deletes(post.select(*SCORER_COLS))
        if deny_ids is not None:
            post = post.unionByName(
                _pseudo_rows_df(deny_ids, meta.range_size, DEL_TERM))
        if allow is not None:
            post = post.unionByName(
                _allow_rows_df(allow, meta.range_size))
        factory = _make_range_scorer if conjunctive else _make_or_range_scorer
        extra = ({"min_should_match": min_should_match}
                 if not conjunctive and min_should_match > 1 else {})
        scored = (post.groupby("range_id")
                  .cogroup(norms.select(*SCORER_COLS).groupby("range_id"))
                  .applyInPandas(
                      factory(terms_by_rarity, idf_by_term,
                              meta.avgdl, k_cut,
                              allow=allow is not None,
                              sentinel_of=sentinel_of,
                              avgdl_of=avgdl_of,
                              deny=deny or None, after=after, **extra),
                      "doc_id long, score double"))
        if k is None:
            return scored
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _phrase_topk(self, query: str, terms_dedup: list[str],
                     idf_by_term: dict[str, float], k: int,
                     allow: DataFrame | None = None,
                     slop: int = 0,
                     phrase_freq: bool = False,
                     after: tuple | None = None,
                     deny_ids: DataFrame | None = None) -> DataFrame:
        """Content-field phrase mode — one clause of the general whole-words
        path (positions live IN the postings rows — no second table, no
        corpus-wide doclen decode: the scorer touches only ranges containing
        all phrase terms, and norms blocks overlapping actual matches)."""
        from ..tokenizer import tokenize_text
        seq = tokenize_text(query)          # with duplicates, in order
        if not seq:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        clause: PhraseClause = (seq, terms_dedup, DOCLEN_TERM,
                                self.meta.avgdl)
        return self._phrase_clauses_topk([clause], idf_by_term, k, allow,
                                         slop=slop,
                                         phrase_freq=phrase_freq,
                                         after=after, deny_ids=deny_ids)

    def topk_whole_words(self, field_texts: dict[str, str], k: int = 10,
                         allow: DataFrame | None = None) -> DataFrame:
        """Reference "whole words" mode across fields
        (``cLuceneIndexReader.java:285-301``): one PhraseQuery per non-empty
        field over its ANALYZED token sequence (namespaced terms for
        metadata fields — requires the index built with ``field_cols``),
        all clauses MUST-conjoined, clause scores summed with per-field
        norms. Returns (doc_id, score)."""
        from ..tokenizer import tokenize_text
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        raw: list[tuple[list[str], str]] = []   # (namespaced seq, sentinel)
        for field, text in field_texts.items():
            if not text or not str(text).strip():
                continue
            seq = tokenize_text(str(text))
            if not seq:
                continue
            if field in ("", "content"):
                raw.append((seq, DOCLEN_TERM))
            else:
                raw.append(([f"{field}:{t}" for t in seq], field + ":"))
        if not raw:
            return empty
        all_terms = list(dict.fromkeys(t for seq, _ in raw for t in seq))
        df_by_term = self._df_lookup(all_terms)
        if any(t not in df_by_term for t in all_terms):
            return empty
        idf_by_term = {t: _idf(self.meta.n_docs, df_by_term[t])
                       for t in all_terms}
        avgdl_of = self._avgdl_by_sentinel(sorted({s for _, s in raw}))
        clauses: list[PhraseClause] = [
            (seq, list(dict.fromkeys(seq)), s, avgdl_of[s])
            for seq, s in raw]
        return self._phrase_clauses_topk(clauses, idf_by_term, k, allow)

    def _phrase_clauses_topk(self, clauses: list[PhraseClause],
                             idf_by_term: dict[str, float],
                             k: int | None,
                             allow: DataFrame | None = None,
                             slop: int | list[int] = 0,
                             phrase_freq: bool = False,
                             after: tuple | None = None,
                             deny_ids: DataFrame | None = None,
                             boosts: list[float] | None = None,
                             occurs: list[str] | None = None) -> DataFrame:
        """``k=None`` = score-ALL mode (same contract as ``_score_terms``:
        a per-range cut of ``range_size + 1`` provably never triggers).
        ``deny_ids``: a (doc_id) DataFrame excluded from every clause's
        candidates — encoded as extra DEL_TERM pseudo-postings that union
        with the index tombstones inside ``_pop_pseudo_docs`` (the
        generalized MUST_NOT channel: deny phrases / ranges / structured
        groups all compile to an id set, nothing reaches the driver).
        ``boosts``: per-clause score multipliers (Lucene ``"a b"^2``).
        ``occurs``: per-clause "+"/"" Lucene BooleanQuery occur semantics
        (default all MUST) — see ``_make_phrase_scorer``."""
        meta = self.meta
        spark = self.spark
        if not meta.positions:
            raise ValueError("index was built without positions=True")
        k_cut = k if k is not None else meta.range_size + 1
        terms_all = sorted({t for _, td, _, _ in clauses for t in td})
        sentinels = sorted({s for _, _, s, _ in clauses})
        # all-SHOULD clause sets are legal (round 4, final): the scorer's
        # no-MUST path matches the union of the SHOULD clauses' matches
        post = self.post.filter(F.col("term").isin(terms_all))
        norms = self.norms.filter(F.col("term").isin(sentinels))
        if not self._cached:
            bmap = _buckets_of(terms_all + sentinels, meta.n_buckets, spark)
            post = post.filter(F.col("bucket").isin(
                sorted({bmap[t] for t in terms_all})))
            norms = norms.filter(F.col("bucket").isin(
                sorted({bmap[s] for s in sentinels})))
        post = self._with_deletes(post.select(*SCORER_COLS))
        if deny_ids is not None:
            post = post.unionByName(
                _pseudo_rows_df(deny_ids, meta.range_size, DEL_TERM))
        if allow is not None:
            post = post.unionByName(_allow_rows_df(allow, meta.range_size))
        scored = (post.groupby("range_id")
                  .cogroup(norms.select(*SCORER_COLS).groupby("range_id"))
                  .applyInPandas(
                      _make_phrase_scorer(clauses, idf_by_term, k_cut,
                                          allow=allow is not None,
                                          slop=slop,
                                          phrase_freq=phrase_freq,
                                          after=after,
                                          boosts=boosts,
                                          occurs=occurs),
                      "doc_id long, score double"))
        if k is None:
            return scored
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def topk_batch(self, queries: dict[str, str], k: int = 10,
                   mode: str = "and") -> DataFrame:
        """Score a BATCH of queries in ONE distributed pass: returns
        (query_id, doc_id, score, rank<=k). Amortizes job overhead across
        queries — the throughput-oriented serving path (single-query p50 in
        local mode is dominated by fixed job costs; a real deployment
        batches the query stream exactly like this). ``mode`` "and" runs
        every query as a MUST conjunction (block-max WAND); "or" as a
        SHOULD union (MaxScore) — one mode per pass, mirroring
        ``topk``."""
        if mode not in ("and", "or"):
            raise ValueError(f"unknown batch mode: {mode!r}")
        spark = self.spark
        meta = self.meta
        all_terms = sorted({t for q in queries.values()
                            for t in query_terms(q)})
        out_schema = "query_id string, doc_id long, score double"
        if not all_terms:
            return spark.createDataFrame([], out_schema + ", rank int")
        df_by_term = self._df_lookup(all_terms)
        conj = mode == "and"
        plans = []  # (qid, terms_by_rarity, idf_by_term)
        for qid, q in queries.items():
            terms = query_terms(q)
            if conj:
                if not terms or any(t not in df_by_term for t in terms):
                    continue
            else:
                terms = [t for t in terms if t in df_by_term]
                if not terms:
                    continue
            idf = {t: _idf(meta.n_docs, df_by_term[t]) for t in terms}
            plans.append((qid, sorted(terms, key=lambda t: (df_by_term[t], t)),
                          idf))
        if not plans:
            return spark.createDataFrame([], out_schema + ", rank int")
        live_terms = sorted({t for _, ts, _ in plans for t in ts})
        post = self.post.filter(F.col("term").isin(live_terms))
        norms = self.norms.filter(F.col("term") == DOCLEN_TERM)
        if not self._cached:
            # disk path: bucket pruning = parquet partition pruning (the
            # same pushdown the single-query path gets)
            bmap = _buckets_of(live_terms + [DOCLEN_TERM], meta.n_buckets,
                               spark)
            buckets = sorted({bmap[t] for t in live_terms})
            post = post.filter(F.col("bucket").isin(buckets))
            norms = norms.filter(F.col("bucket") == bmap[DOCLEN_TERM])
        avgdl, kk = meta.avgdl, k

        def score_ranges(_key, post_pdf: pd.DataFrame, norms_pdf: pd.DataFrame
                         ) -> pd.DataFrame:
            out = []
            factory = _make_range_scorer if conj else _make_or_range_scorer
            # shared-scan batching: one decode pool per range invocation —
            # a term shared by many queries in the batch is materialized
            # and block-decoded once per range, not once per query
            pool: dict = {}
            scorers = {
                qid: factory(ts, idf, avgdl, kk, cache_pool=pool)
                for qid, ts, idf in plans}
            # every plan receives the FULL group frame: a scorer reads only
            # its own terms out of (pooled) by_term, so the former per-plan
            # isin+slice — O(plans x rows) pandas work per range — is
            # unnecessary; with the pool it was the dominant per-(query,
            # range) cost in wide batches
            for qid, ts, idf in plans:
                r = scorers[qid](_key, post_pdf, norms_pdf)
                if len(r):
                    r = r.copy()
                    r.insert(0, "query_id", qid)
                    out.append(r)
            if not out:
                return pd.DataFrame({"query_id": pd.Series(dtype=object),
                                     "doc_id": pd.Series(dtype=np.int64),
                                     "score": pd.Series(dtype=np.float64)})
            return pd.concat(out, ignore_index=True)

        scored = (self._with_deletes(post.select(*SCORER_COLS))
                  .groupby("range_id")
                  .cogroup(norms.select(*SCORER_COLS).groupby("range_id"))
                  .applyInPandas(score_ranges, out_schema))
        from pyspark.sql import Window
        w = (Window.partitionBy("query_id")
             .orderBy(F.desc("score"), F.asc("doc_id")))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

    # -- prefix queries (Lucene PrefixQuery / MultiTermQuery rewrite) ------

    def expand_prefix(self, prefix: str, max_expansions: int = 128
                      ) -> list[str]:
        """Term-dictionary expansion: the ``max_expansions`` highest-df
        terms starting with ``prefix``, deterministic (df desc, term asc) —
        Lucene TopTermsRewrite's size bound. A content prefix never crosses
        into namespaced metadata terms; a ``field:pre`` prefix stays inside
        that field. Field/doclen sentinel rows (terms ending in ``:`` or
        empty) are never expansions. The dictionary scan is vocabulary-
        sized (≪ corpus at any scale) and pushdown-filtered on term_stats
        when not pinned driver-side."""
        prefix = prefix.strip().lower()
        if not prefix:
            return []
        in_field = ":" in prefix
        if self._stats_local is not None:
            cands = [(df, t) for t, (df, _) in self._stats_local.items()
                     if t.startswith(prefix) and not t.endswith(":")
                     and (in_field or ":" not in t)]
            cands.sort(key=lambda x: (-x[0], x[1]))
            return [t for _, t in cands[:max_expansions]]
        cond = (F.col("term").startswith(prefix)
                & ~F.col("term").endswith(":"))
        if not in_field:
            cond &= ~F.col("term").contains(":")
        rows = (self.stats.filter(cond)
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def expand_fuzzy(self, term: str, max_edits: int = 2,
                     max_expansions: int = 50) -> list[str]:
        """Lucene ``FuzzyQuery`` expansion: dictionary terms within
        Levenshtein distance ``max_edits`` of ``term``, ordered
        (distance asc, df desc, term asc) and capped at ``max_expansions``
        (Lucene's default 50). The scan is vocabulary-sized with a
        term-length pre-filter (|len(t) − len(q)| ≤ max_edits) so the DP
        runs on a sliver of the dictionary; namespaced metadata terms and
        sentinels are never expansions. Lucene's automaton is a constant
        here, not an asymptotic need — the dictionary, not the corpus, is
        the domain."""
        return [t for t, _ in
                self.expand_fuzzy_dists(term, max_edits, max_expansions)]

    def expand_fuzzy_dists(self, term: str, max_edits: int = 2,
                           max_expansions: int = 50, field: str = ""
                           ) -> list[tuple[str, int]]:
        """expand_fuzzy with each expansion's edit distance — the input to
        Lucene's similarity boost 1 − dist/min(|query|, |term|)
        (``FuzzyTermsEnum`` boost attribute). ``field`` scopes the
        expansion to that field's ``field:token`` namespace (round 4:
        MultiFieldQueryParser accepts field-scoped fuzzies); returned
        terms keep the namespace, distances are on the bare token."""
        term = term.strip().lower()
        if not term:
            return []
        pre = f"{field}:" if field else ""
        if self._stats_local is not None:
            cands = []
            for t, (df, _) in self._stats_local.items():
                base = t[len(pre):] if pre else t
                if pre:
                    if not t.startswith(pre) or ":" in base or not base:
                        continue    # excludes the "field:" norms sentinel
                elif ":" in t or not t:
                    continue
                if abs(len(base) - len(term)) > max_edits:
                    continue
                d = _levenshtein_capped(base, term, max_edits)
                if d <= max_edits:
                    cands.append((d, -df, t))
            cands.sort()
            return [(t, d) for d, _, t in cands[:max_expansions]]
        base_col = (F.substring("term", len(pre) + 1, 1 << 20) if pre
                    else F.col("term"))
        ns_pred = (F.col("term").startswith(pre)
                   & ~base_col.contains(":")
                   & (F.length("term") > len(pre)) if pre
                   else ~F.col("term").contains(":"))
        rows = (self.stats
                .filter((F.length("term")
                         >= F.lit(len(term) + len(pre) - max_edits))
                        & (F.length("term")
                           <= F.lit(len(term) + len(pre) + max_edits))
                        & ns_pred
                        & (F.col("term") != DOCLEN_TERM))
                .withColumn("dist",
                            F.levenshtein(base_col, F.lit(term)))
                .filter(F.col("dist") <= max_edits)
                .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
                .limit(max_expansions).collect())
        return [(r["term"], int(r["dist"])) for r in rows]

    def expand_wildcard(self, pattern: str, max_expansions: int = 128,
                        field: str = "") -> list[str]:
        """Lucene ``WildcardQuery`` expansion: ``*`` = any run, ``?`` = one
        char, anchored both ends; ordered (df desc, term asc), capped.
        Same dictionary-scan discipline as expand_prefix. ``field`` scopes
        the expansion to that field's namespace (round 4)."""
        import re
        pattern = pattern.strip().lower()
        if not pattern:
            return []
        rx = "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern)
        return self._expand_rx(rx, max_expansions, field)

    def expand_regexp(self, rx: str, max_expansions: int = 128,
                      field: str = "") -> list[str]:
        """Lucene ``RegexpQuery`` expansion: the pattern is anchored both
        ends (Lucene regexp semantics — it must match the WHOLE term),
        ordered (df desc, term asc), capped. Same dictionary-scan
        discipline as expand_prefix/expand_wildcard: vocabulary-sized, a
        bounded control-plane lookup at any corpus scale. ``field`` scopes
        the expansion to that field's namespace (round 4)."""
        rx = rx.strip()
        if not rx:
            return []
        return self._expand_rx("(?:" + rx + ")", max_expansions, field)

    def _expand_rx(self, rx: str, max_expansions: int,
                   field: str = "") -> list[str]:
        """Shared anchored-regexp dictionary expansion, optionally scoped
        to a field's ``field:token`` namespace. The match applies to the
        bare token; returned terms keep the namespace."""
        import re
        pre = f"{field}:" if field else ""
        anchored = "^(?:" + rx + ")$"
        crx = re.compile(anchored)   # raises re.error on a bad pattern
        if self._stats_local is not None:
            cands = []
            for t, (df, _) in self._stats_local.items():
                base = t[len(pre):] if pre else t
                if pre:
                    if not t.startswith(pre) or ":" in base or not base:
                        continue    # excludes the "field:" norms sentinel
                elif ":" in t or not t:
                    continue
                if crx.match(base):
                    cands.append((-df, t))
            cands.sort()
            return [t for _, t in cands[:max_expansions]]
        base_col = (F.substring("term", len(pre) + 1, 1 << 20) if pre
                    else F.col("term"))
        ns_pred = (F.col("term").startswith(pre)
                   & ~base_col.contains(":")
                   & (F.length("term") > len(pre)) if pre
                   else ~F.col("term").contains(":"))
        rows = (self.stats
                .filter(base_col.rlike(anchored)
                        & ns_pred
                        & (F.col("term") != DOCLEN_TERM))
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def topk_regexp(self, rx: str, k: int = 10,
                    max_expansions: int = 128) -> DataFrame:
        """Lucene ``RegexpQuery`` (``/pattern/``) with the scoring-boolean
        rewrite: whole-term regexp expansion over the dictionary, scored
        as a SHOULD union (MaxScore)."""
        terms = self.expand_regexp(rx, max_expansions)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        return self._score_terms(terms, k, conjunctive=False)

    def topk_fuzzy(self, term: str, k: int = 10, max_edits: int = 2,
                   max_expansions: int = 50,
                   weighted: bool = True) -> DataFrame:
        """Lucene ``FuzzyQuery`` (``term~``) with the scoring-boolean
        rewrite: expansion terms scored as a SHOULD union (MaxScore).
        ``weighted`` (default, round-4: closes the COVERAGE U2f
        divergence) down-weights each expansion by Lucene's similarity
        1 − dist/min(|query|, |term|) (``FuzzyTermsEnum`` boost) through
        the existing boost machinery — WAND/MaxScore bounds derive from
        the boosted idfs, so pruning stays exact. ``weighted=False``
        keeps the plain unweighted union (all expansions equal)."""
        pairs = self.expand_fuzzy_dists(term, max_edits, max_expansions)
        if not pairs:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        terms = [t for t, _ in pairs]
        boosts = (_fuzzy_boosts(term.strip().lower(), pairs)
                  if weighted else None)
        return self._score_terms(terms, k, conjunctive=False,
                                 boosts=boosts)

    def topk_wildcard(self, pattern: str, k: int = 10,
                      max_expansions: int = 128) -> DataFrame:
        """Lucene ``WildcardQuery`` (``te*m``/``te?m``), scoring-boolean
        rewrite over the dictionary expansion."""
        terms = self.expand_wildcard(pattern, max_expansions)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        return self._score_terms(terms, k, conjunctive=False)

    def topk_prefix(self, prefix: str, k: int = 10,
                    max_expansions: int = 128) -> DataFrame:
        """Lucene ``PrefixQuery`` (``term*``) with the scoring-boolean
        rewrite (``MultiTermQuery.SCORING_BOOLEAN_QUERY_REWRITE``): expand
        against the term dictionary, then score the SHOULD union with the
        MaxScore scorer. Not reachable from the reference UI (the wrapper
        emits only MUST term queries) but core Lucene surface."""
        terms = self.expand_prefix(prefix, max_expansions)
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        return self._score_terms(terms, k, conjunctive=False)

    # -- match set + facets (Lucene collector analog) -----------------------

    def match_ids(self, query: str, mode: str = "and",
                  must_not: str | None = None) -> DataFrame:
        """ALL matching docIDs (no scores): MUST intersection or SHOULD
        union, tombstone-aware, deny terms anti-joined — the substrate for
        faceting and match counting. One grouped-map over the term-filtered
        (bucket-pruned) postings; output stays distributed."""
        terms = query_terms(query)
        deny = query_terms(must_not) if must_not else []
        return self._match_terms(terms, mode != "or", deny)

    def _match_terms(self, terms: list[str], conjunctive: bool,
                     deny: list[str] | None = None) -> DataFrame:
        """match_ids over pre-analyzed (possibly namespaced) terms — the
        query-string executor calls this directly so ``path:parse`` is not
        re-analyzed into two content terms."""
        empty = self.spark.createDataFrame([], "doc_id long")
        deny = list(deny or [])
        if not terms:
            return empty
        df_by_term = self._df_lookup(terms)
        if conjunctive:
            if any(t not in df_by_term for t in terms):
                return empty
        else:
            terms = [t for t in terms if t in df_by_term]
        deny = ([t for t in deny if t in self._df_lookup(deny)]
                if deny else [])
        if conjunctive and set(terms) & set(deny):
            return empty
        if not conjunctive:
            terms = [t for t in terms if t not in set(deny)]
        if not terms:
            return empty
        fetch = terms + deny
        if self._cached:
            post = self.post.filter(F.col("term").isin(fetch))
        else:
            bmap = _buckets_of(fetch, self.meta.n_buckets, self.spark)
            post = self.post.filter(
                F.col("bucket").isin(sorted({bmap[t] for t in fetch}))
                & F.col("term").isin(fetch))
        post = self._with_deletes(post.select(*SCORER_COLS))
        return (post.groupby("range_id")
                .applyInPandas(
                    _make_range_matcher(terms, conjunctive, deny or None),
                    "doc_id long"))

    def _phrase_match_ids(self, field: str | None, seq: list[str],
                          slop: int = 0) -> "DataFrame | None":
        """Match set of a (possibly field-scoped, pre-namespaced) phrase:
        doc_ids where the clause's terms chain consecutively (or within
        ``slop``, SpanNear semantics) — the score-all phrase substrate
        with scores discarded. ``None`` = a constituent term is absent
        from the corpus, so the phrase matches nothing."""
        if not seq:
            return None
        df_by_term = self._df_lookup(seq)
        if any(t not in df_by_term for t in seq):
            return None
        sent = (field + ":" if field and field != "content"
                else DOCLEN_TERM)
        avgdl = self._avgdl_by_sentinel([sent])[sent]
        clause: PhraseClause = (seq, list(dict.fromkeys(seq)), sent, avgdl)
        return self._phrase_clauses_topk(
            [clause], {t: 1.0 for t in seq}, k=None,
            slop=slop).select("doc_id")

    def _range_match_ids(self, field: str, text: str,
                         excl: int) -> DataFrame:
        """Match set of a ``field:[lo TO hi]`` clause: the docmap scan
        filtered by a pushed-down comparison predicate (typed literals,
        never a column cast — a cast would block parquet pushdown,
        pinned by test_plan_audit). ``excl`` carries the bracket
        grammar: bit0/bit1 = lo/hi EXCLUSIVE ({lo TO hi} and mixed
        forms). Shared by top-level range clauses and RangeLeaf members
        inside () groups (round 4)."""
        lo_s, hi_s = text.split(" TO ", 1)
        dm = self.docmap()
        if field not in dm.columns:
            raise ValueError(f"unknown range field: {field!r}")
        from pyspark.sql.types import NumericType
        col = F.col(field)
        lo_x, hi_x = bool(excl & 1), bool(excl & 2)
        # Lucene open-ended bounds: [* TO x] / [x TO *] drop that side
        # of the predicate; [* TO *] matches docs where the field is
        # present (TermRangeQuery's null-bound form). The surviving
        # comparisons stay pushdown-able typed literals.
        lo_open, hi_open = lo_s == "*", hi_s == "*"

        def mk_pred(lo_v, hi_v):
            lo_p = (None if lo_open else
                    (col > lo_v) if lo_x else (col >= lo_v))
            hi_p = (None if hi_open else
                    (col < hi_v) if hi_x else (col <= hi_v))
            if lo_p is None and hi_p is None:
                return col.isNotNull()
            if lo_p is None:
                return hi_p
            if hi_p is None:
                return lo_p
            return lo_p & hi_p

        if isinstance(dm.schema[field].dataType, NumericType):
            try:
                lo_n = (None if lo_open else
                        int(lo_s) if float(lo_s).is_integer()
                        else float(lo_s))
                hi_n = (None if hi_open else
                        int(hi_s) if float(hi_s).is_integer()
                        else float(hi_s))
            except ValueError:
                raise ValueError(
                    f"non-numeric bounds for numeric field "
                    f"{field!r}: {text!r}")
            pred = mk_pred(lo_n, hi_n)
        else:
            pred = mk_pred(lo_s, hi_s)       # lexicographic
        return dm.filter(pred).select("doc_id")

    def _expand_leaf(self, e) -> tuple[list[str], "dict[str, float] | None"]:
        """Expand a group ExpansionLeaf (round 4) against the dictionary:
        (terms, fuzzy similarity weights or None). Same caps and
        dictionary scans as the top-level expansion clauses. A
        field-scoped leaf (round 4, final: ``(+lang:py* x)``) scans the
        field's ``field:token`` namespace slice, exactly like top-level
        field expansions."""
        fld = e.field if e.field and e.field != "content" else ""
        pre = f"{fld}:" if fld else ""
        if e.kind == "prefix":
            return self.expand_prefix(pre + e.text.lower()), None
        if e.kind == "wildcard":
            return self.expand_wildcard(e.text.lower(), field=fld), None
        if e.kind == "regexp":
            return self.expand_regexp(e.text, field=fld), None
        pat = e.text.lower()
        pairs = self.expand_fuzzy_dists(pat, max_edits=e.num, field=fld)
        # Lucene FuzzyQuery similarity on the bare token (namespace
        # prefix excluded from the length)
        sims = {t: 1.0 - d / min(len(pat), len(t) - len(pre))
                for t, d in pairs}
        return [t for t, _ in pairs], sims

    def _expand_leaf_terms(self, e) -> list[str]:
        return self._expand_leaf(e)[0]

    def _match_tree(self, node) -> "DataFrame | None":
        """Match set of a nested boolean group (parser.GroupNode): doc_ids
        matching the tree. Term leaves batch into ONE grouped-map matcher
        pass per occur bucket per level (conjunctive for MUSTs, disjunctive
        for SHOULDs); subgroup match sets compose with joins (MUST),
        distinct unions (SHOULD), and a left-anti join (MUST_NOT). Depth is
        query-proportional (tiny); every set stays distributed."""
        from ..tokenizer import tokenize_text
        from .parser import (ExpansionLeaf, FieldLeaf, GroupNode,
                             PhraseLeaf, RangeLeaf, TermLeaf)

        def toks(items) -> list[str]:
            out: list[str] = []
            for a in items:
                if isinstance(a, str):
                    out += tokenize_text(a)
                elif isinstance(a, TermLeaf):
                    # boosted plain term (round 4, final): boosts never
                    # affect matching
                    out += tokenize_text(a.text)
                elif isinstance(a, FieldLeaf):
                    # field-scoped term member (round 4): the field's
                    # namespaced dictionary slice
                    out += [f"{a.field}:{t}"
                            for t in tokenize_text(a.text)]
            return out

        def rngs(items) -> list["RangeLeaf"]:
            return [a for a in items if isinstance(a, RangeLeaf)]

        def subs(items):
            return [a for a in items if isinstance(a, GroupNode)]

        def phrase_ids(p: "PhraseLeaf") -> "DataFrame":
            """Match set of a PhraseLeaf (round 4, optionally
            field-scoped — positions in the field's namespace); a phrase
            with an absent constituent term matches nothing."""
            seq = tokenize_text(p.text)
            if p.field and p.field != "content":
                seq = [f"{p.field}:{t}" for t in seq]
            s = self._phrase_match_ids(p.field or None, seq, slop=p.slop)
            return (s if s is not None else
                    self.spark.createDataFrame([], "doc_id long"))

        def phs(items) -> list["PhraseLeaf"]:
            return [a for a in items if isinstance(a, PhraseLeaf)]

        def exp_ids(e: "ExpansionLeaf") -> "DataFrame":
            """Match set of an ExpansionLeaf (round 4): the expanded
            terms' SHOULD union; an expansion matching no dictionary
            term matches nothing."""
            terms = self._expand_leaf_terms(e)
            return (self._match_terms(terms, conjunctive=False) if terms
                    else self.spark.createDataFrame([], "doc_id long"))

        def exs(items) -> list["ExpansionLeaf"]:
            return [a for a in items if isinstance(a, ExpansionLeaf)]

        # set operators (intersect / union+distinct / subtract), not joins:
        # every operand descends from the SAME cached postings relation, so
        # a join trips Spark's ambiguous-self-join analysis; set ops are
        # also the exact semantics (all frames are distinct doc_id sets)
        m: DataFrame | None = None
        if node.musts:
            mt = toks(node.musts)
            if mt:
                m = self._match_terms(mt, conjunctive=True)
            for g in subs(node.musts):
                s = self._match_tree(g)
                m = s if m is None else m.intersect(s)
            for p in phs(node.musts):
                s = phrase_ids(p)
                m = s if m is None else m.intersect(s)
            for e in exs(node.musts):
                s = exp_ids(e)
                m = s if m is None else m.intersect(s)
            for r in rngs(node.musts):
                s = self._range_match_ids(r.field, r.text, r.num)
                m = s if m is None else m.intersect(s)
        else:
            unioned = False
            st = toks(node.shoulds)
            if st:
                m = self._match_terms(st, conjunctive=False)
            for g in subs(node.shoulds):
                s = self._match_tree(g)
                if m is None:
                    m = s
                else:
                    m = m.union(s)
                    unioned = True
            for p in phs(node.shoulds):
                s = phrase_ids(p)
                if m is None:
                    m = s
                else:
                    m = m.union(s)
                    unioned = True
            for e in exs(node.shoulds):
                s = exp_ids(e)
                if m is None:
                    m = s
                else:
                    m = m.union(s)
                    unioned = True
            for r in rngs(node.shoulds):
                # SHOULD-positioned range (round 4, final): joins the
                # match union — a doc can MATCH through it — but never
                # scores (the pinned constant-score divergence)
                s = self._range_match_ids(r.field, r.text, r.num)
                if m is None:
                    m = s
                else:
                    m = m.union(s)
                    unioned = True
            if m is not None and unioned:
                m = m.distinct()
        if m is None:
            return None
        neg: DataFrame | None = None
        nt = toks(node.nots)
        if nt:
            neg = self._match_terms(nt, conjunctive=False)
        for g in subs(node.nots):
            s = self._match_tree(g)
            neg = s if neg is None else neg.union(s)
        for p in phs(node.nots):
            s = phrase_ids(p)
            neg = s if neg is None else neg.union(s)
        for e in exs(node.nots):
            s = exp_ids(e)
            neg = s if neg is None else neg.union(s)
        for r in rngs(node.nots):
            s = self._range_match_ids(r.field, r.text, r.num)
            neg = s if neg is None else neg.union(s)
        if neg is not None:
            m = m.subtract(neg)
        return m

    def count(self, query: str, mode: str = "and",
              must_not: str | None = None) -> int:
        """Lucene ``IndexSearcher.count`` analog: the number of documents
        matching the query — the full match set's cardinality, not a top-k
        artifact. The grouped-map matcher emits (doc_id) rows per range and
        the count is one distributed agg; no scores are computed and no
        norms are decoded anywhere. ``mode="lucene"`` (round 4) counts a
        full classic query string (phrases, deny clauses, ranges, groups,
        expansions) via the score-all substrate (``query_string(k=None)``)
        — scores are computed there but never sorted or collected."""
        if mode == "lucene":
            return self.query_string(query, k=None).count()
        return self.match_ids(query, mode=mode, must_not=must_not).count()

    def more_like_this(self, doc_id: int, k: int = 10,
                       max_query_terms: int = 25,
                       min_doc_freq: int = 2) -> DataFrame:
        """Lucene ``MoreLikeThis``: pick the source doc's
        ``max_query_terms`` most characteristic terms by tf·idf (terms with
        df < ``min_doc_freq`` dropped, ties broken term asc), score the
        SHOULD union with MaxScore, and exclude the source doc itself.
        Driver work is one stored-doc fetch + one dictionary lookup —
        control-plane; the ranking is the ordinary distributed union."""
        import os as _os
        dm = self.docmap()
        row = (dm.filter(F.col("doc_id") == int(doc_id))
               .select("content").take(1))
        if not row:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        from ..tokenizer import tokenize_text
        toks = tokenize_text(row[0]["content"] or "")
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        df_by_term = self._df_lookup(sorted(tf))
        cands = sorted(
            ((-tf[t] * _idf(self.meta.n_docs, df_by_term[t]), t)
             for t in tf
             if df_by_term.get(t, 0) >= min_doc_freq),)
        terms = [t for _, t in cands[:max_query_terms]]
        if not terms:
            return self.spark.createDataFrame(
                [], "doc_id long, score double")
        # over-fetch one, drop the source doc, re-cut to k
        scored = self._score_terms(terms, k + 1, conjunctive=False)
        return (scored.filter(F.col("doc_id") != int(doc_id))
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    def query_string(self, q: str, k: int | None = 10) -> DataFrame:
        """Execute a Lucene classic query string (the syntax the reference
        feeds to ``MultiFieldQueryParser``) — see ``query.parser`` for the
        supported grammar. ``k=None`` = score-ALL mode: every matching doc
        with its exact score, unsorted and uncut (the counting / faceting
        substrate). Compilation onto the existing scorers:

        - MUST_NOT term clauses → scorer deny lists (anti-joined inside the
          range scorers, never a post-filter).
        - prefix/fuzzy/wildcard clauses → dictionary expansion; their terms
          join the SHOULD union (Lucene's scoring-boolean rewrite). A MUST
          expansion additionally restricts candidates to the expansion's
          match set via the exact allowlist.
        - quoted phrases carry their occur (round 4, final — the earlier
          always-MUST divergence is CLOSED): ``+"a b"`` restricts the
          match set, a bare ``"a b"`` is a SHOULD clause that scores
          where it matches (over the MUST candidates when MUSTs exist,
          else joining the match union — exact classic-parser
          default-OR semantics). Phrases compile to whole-words clauses
          with per-clause slop; bare MUST terms ride along as 1-token
          MUST clauses and bare SHOULD terms as scoring-only SHOULD
          clauses, so ``+table "stream window"~3 fast`` is ONE cogroup
          pass with exact BooleanQuery occur semantics.
        - mixed MUST + SHOULD terms: the SHOULD union scorer runs restricted
          to ``match_ids(MUST)`` through the allowlist — score = sum of all
          present terms over docs matching every MUST, which is exactly
          Lucene's BooleanQuery scoring.

        - ``atom^B`` boosts scale the clause's term weights (idf × boost),
          which rides through the WAND / MaxScore bounds unchanged; when
          any boost is present, duplicate clauses SUM their boosts
          (Lucene's duplicate-clause scoring).
        - ``/regex/`` clauses expand like wildcards (whole-term anchored
          regexp over the dictionary) into the SHOULD union.
        - ``field:[lo TO hi]`` ranges compile to a docmap-scan predicate
          whose doc ids join the exact allowlist — a non-scoring MUST
          filter (Lucene constant-score rewrite divergence, see parser).
        - ``(a b)`` groups: ``+(a b)`` restricts candidates to the group's
          match union via the allowlist (Lucene MUST-of-SHOULDs scoring),
          ``-(a b)`` denies every group term (De Morgan), ``(a b)^2``
          boosts each group term. Members of EVERY group shape — flat,
          field-scoped, and structured/nested (round 4, final) — may
          carry their own ``^B`` (``(a^2 wind*^3 b)``, ``(+a b^2)``), and
          whole subgroups may too (``(a (b c)^2)``): member, subgroup,
          and group boosts multiply down the tree, duplicate member
          tokens SUM (so ``(a^2 b)`` ≡ ``(a a b)``, Lucene's
          per-SHOULD-clause scoring).
        - **nested boolean groups** (``+(+a +(b c) -d)``): exact boolean
          matching via ``_match_tree`` set algebra; scoring is exact
          Lucene BooleanQuery for EVERY nesting shape (round 4) — leaves
          gated by a SHOULD-positioned structured subgroup score only
          over that subgroup's match set and SUM per doc with the base
          frame (``_gated_sum``); ungated leaves flatten into the SHOULD
          union, and the plan is unchanged when no gated class exists.
          Groups accept field-scoped phrases (``(path:"file txt"~N c)``,
          positions + norms in the field namespace), field-scoped
          expansions (``(+lang:py* x)``), field-scoped GROUPS at any
          depth (``(+lang:(en fr) x)``, round 4 final), and ranges in
          ANY occur position (a SHOULD range joins the match union,
          never scores).
        - ``*:*`` (round 4, final): Lucene MatchAllDocsQuery — every
          live doc at constant score Σ boosts, minus tombstones and
          MUST_NOT sets, intersected with range filters; deterministic
          doc_id order. Beside BM25-scoring clauses it mixes exactly
          like Lucene's BooleanQuery: scored docs gain the constant,
          and (absent a MUST scoring clause) every other live doc
          matches at exactly the constant, doc_id order.

        Field-scoped expansions (``path:parse*``, ``lang:pyth~1``,
        ``path:/t.st/``) scan the field's namespaced dictionary slice and
        match the bare token (round 4 — MultiFieldQueryParser parity).
        Fuzzy suffixes accept legacy fractional similarity (``term~0.8``
        → max edits via FuzzyQuery.floatToEdits); range bounds accept
        ``*`` (open-ended) and ``field:*`` is FieldExistsQuery sugar for
        ``field:[* TO *]`` (round 4, final).

        **Generalized MUST_NOT** (round 4): ``-"a b"`` (phrases, with
        ``~N`` slop), ``-field:[lo TO hi]`` (ranges), ``-(+a (b c))``
        (structured nested groups) and ``-foo*``/``-fuzz~1``/``-/re.ex/``
        (expansions) all work — expansions De-Morgan onto the in-scorer
        deny-terms path; phrase/range/structured-group deny sets compile
        to doc-id DataFrames riding the DEL_TERM pseudo-postings channel
        (union with tombstones inside every scorer; nothing reaches the
        driver). ``"a b"^2`` phrase boosts multiply that clause's score
        (Lucene PhraseQuery boost).

        Unsupported (loud ValueError): range boosts (ranges never score
        here)."""
        from ..tokenizer import tokenize_text
        from .parser import parse_query_string
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        clauses = parse_query_string(q)
        if not clauses:
            return empty
        must_terms: list[str] = []
        should_terms: list[str] = []
        deny_terms: list[str] = []
        # (field, tokens, slop, boost, occur) — occur "+" restricts the
        # match set, "" is a scoring-only SHOULD clause (round 4, final)
        phrase_specs: list[tuple[str, list[str], int, float, str]] = []
        allow_sets: list[DataFrame] = []
        # Generalized MUST_NOT (round 4): deny phrases / ranges /
        # structured nested groups compile to doc-id match sets that ride
        # the DEL_TERM pseudo-postings channel into every scorer — plain
        # deny TERMS stay on the cheaper in-scorer block-decode path.
        deny_id_sets: list[DataFrame] = []
        # Gated leaf classes of nested groups (round 4): [(gates, terms,
        # weights)] — each scores k=None over its gates' match-set
        # intersection and sums with the base frame per doc (exact
        # BooleanQuery scoring for SHOULD-positioned structured subgroups)
        gated_specs: list[tuple[tuple, list[str], dict[str, float]]] = []
        # Lucene ^boost: when ANY clause carries a boost, per-term weights
        # are the SUM of the owning clauses' boosts (Lucene scores each
        # duplicate SHOULD clause, which sums). Without boosts, duplicate
        # terms stay deduped (pre-boost behavior, pinned by contract
        # hashes) and no weights are passed.
        has_boost = any(c.boost != 1.0 for c in clauses
                        if c.occur != "-")   # MUST_NOT never scores
        boost_acc: dict[str, float] = {}

        def add_boost(toks: list[str], b: float) -> None:
            for t in toks:
                boost_acc[t] = boost_acc.get(t, 0.0) + b

        matchall_boost = 0.0
        for c in clauses:
            if c.field and c.field != "content":
                def ns(t, _f=c.field):
                    return f"{_f}:{t}"
            else:
                def ns(t):
                    return t
            if c.kind == "matchall":
                # Lucene MatchAllDocsQuery (`*:*`): every live doc at
                # constant score boost·1.0; SHOULD clauses sum. `-*:*`
                # is an all-negative query — nothing it can enumerate.
                if c.occur == "-":
                    raise ValueError(
                        "-*:* matches nothing it can enumerate")
                matchall_boost += c.boost
                continue
            if c.kind == "range":
                # field:[lo TO hi] — a non-scoring MUST filter (Lucene's
                # constant-score rewrite adds a flat 1.0; documented
                # divergence). Pushed to the docmap parquet scan as a
                # comparison predicate; numeric when both bounds parse.
                # -range denies the predicate's match set (DEL_TERM
                # channel) — semantically exact, ranges never score.
                if c.boost != 1.0:
                    raise ValueError("range boosts are not supported")
                ids = self._range_match_ids(c.field, c.text, c.num)
                (deny_id_sets if c.occur == "-" else allow_sets).append(ids)
                continue
            if c.kind == "phrase":
                toks = tokenize_text(c.text)
                if c.occur == "-":
                    # -"a b": the phrase's match set (score-all substrate,
                    # scores discarded) rides the DEL_TERM channel; a
                    # phrase with an absent term matches (denies) nothing
                    m = self._phrase_match_ids(
                        c.field, [ns(t) for t in toks], c.num)
                    if m is not None:
                        deny_id_sets.append(m)
                elif toks:
                    phrase_specs.append(
                        (c.field, [ns(t) for t in toks], c.num, c.boost,
                         c.occur))
            elif c.kind == "term":
                toks = [ns(t) for t in tokenize_text(c.text)]
                if c.occur == "-":
                    deny_terms += toks
                elif c.occur == "+":
                    must_terms += toks
                    add_boost(toks, c.boost)
                else:
                    should_terms += toks
                    add_boost(toks, c.boost)
            elif c.kind == "group":
                # (a b) = SHOULD subquery. +group: the doc must match
                # >= 1 group member (allowlist on the union — exactly
                # Lucene's MUST BooleanQuery-of-SHOULDs scoring); -group:
                # the doc must match none (De Morgan: deny each member
                # term). Members may be plain terms or expansions
                # (wind* t?ble fuzz~1 /re.ex/, round 4 — Lucene rewrites
                # multi-term queries inside boolean groups with the same
                # scoring-boolean rewrite; fuzzy members keep their
                # edit-distance similarity weights). A field-scoped group
                # (lang:(python go)) runs over the field's namespace.
                from .parser import parse_query_string as _pqs
                fld = (c.field if c.field and c.field != "content"
                       else "")
                toks: list[str] = []
                wts: dict[str, float] = {}

                def add_member(ts: list[str], w: float) -> None:
                    # duplicate member tokens SUM (Lucene scores each
                    # SHOULD clause of the group independently)
                    for t in ts:
                        toks.append(t)
                        wts[t] = wts.get(t, 0.0) + w

                for sub in _pqs(c.text):
                    # the parser guarantees flat SHOULD members: terms or
                    # prefix/wildcard/fuzzy/regexp, no occur/field —
                    # each optionally ^boosted (round 4, 2nd half)
                    if sub.kind == "term":
                        add_member([ns(t) for t in
                                    tokenize_text(sub.text)], sub.boost)
                    elif sub.kind == "prefix":
                        add_member(self.expand_prefix(ns(
                            sub.text.lower())), sub.boost)
                    elif sub.kind == "wildcard":
                        add_member(self.expand_wildcard(
                            sub.text.lower(), field=fld), sub.boost)
                    elif sub.kind == "fuzzy":
                        pat = sub.text.lower()
                        pairs = self.expand_fuzzy_dists(
                            pat, max_edits=sub.num, field=fld)
                        pre = f"{fld}:" if fld else ""
                        for t, dist in pairs:
                            sim = 1.0 - dist / min(len(pat),
                                                   len(t) - len(pre))
                            add_member([t], sub.boost * sim)
                    elif sub.kind == "regexp":
                        add_member(self.expand_regexp(
                            sub.text, field=fld), sub.boost)
                    else:
                        raise ValueError(
                            f"unsupported member inside () group: "
                            f"{sub.kind} in ({c.text})")
                toks = list(dict.fromkeys(toks))
                if not toks:
                    if c.occur == "+":
                        return empty  # MUST group matching nothing
                    continue
                if c.occur == "-":
                    deny_terms += toks
                    continue
                exist = [t for t in toks if t in self._df_lookup(toks)]
                should_terms += exist
                if any(wts.get(t, 1.0) != 1.0 for t in exist):
                    has_boost = True
                for t in exist:
                    boost_acc[t] = (boost_acc.get(t, 0.0)
                                    + c.boost * wts.get(t, 1.0))
                if c.occur == "+":
                    if not exist:
                        return empty  # MUST group matching nothing
                    allow_sets.append(
                        self._match_terms(exist, conjunctive=False))
            elif c.kind == "nested":
                # Nested boolean group (reference MultiFieldQueryParser
                # accepts arbitrary nesting, cLuceneIndexReader.java:336).
                # Matching: exact boolean algebra over per-subtree match
                # sets (_match_tree — intersections for MUSTs, distinct
                # unions for SHOULDs, anti-joins for MUST_NOTs).
                from .parser import parse_group_tree
                tree = parse_group_tree(c.text)
                if c.occur == "-":
                    if (tree.is_pure_should()
                            and not tree.has_nonterm_leaf()):
                        # flat -(a b c): De Morgan onto the cheap
                        # in-scorer deny-terms path (unsound for phrase
                        # members — their terms may co-occur apart —
                        # and unavailable for expansions, which need
                        # the dictionary)
                        deny_terms += [
                            t for a in tree.positive_leaves()
                            for t in tokenize_text(a)]
                    else:
                        # structured -(+a (b c) -d): the subtree's exact
                        # boolean match set rides the DEL_TERM channel
                        m = self._match_tree(tree)
                        if m is not None:
                            deny_id_sets.append(m)
                    continue
                # Scoring (round 4, exact for EVERY shape): positive
                # leaves split into gate classes (leaf_gate_classes) — a
                # leaf's gate is its structured strict-ancestor subgroups
                # off the covered MUST spine. Empty-gate leaves flatten
                # into the SHOULD union (bit-identical pre-round-4 plan);
                # gated classes score k=None over their gates' match-set
                # intersection and SUM per doc with the base frame —
                # exactly Lucene BooleanQuery scoring, where a SHOULD-
                # positioned structured subgroup contributes only on docs
                # it matches (a present leaf under an unmatched subgroup
                # is stranded, never scored).
                from .parser import ExpansionLeaf as _ExpLeaf
                from .parser import FieldLeaf as _FldLeaf
                from .parser import PhraseLeaf as _PhrLeaf
                from .parser import TermLeaf as _TrmLeaf
                for gates, atoms in tree.leaf_gate_classes(
                        top_guaranteed=(c.occur == "+")):
                    leaves: list[str] = []
                    w: dict[str, float] = {}
                    for a in atoms:
                        # member ^boosts (round 4, final) — and
                        # subgroup boosts, pre-folded into a.boost by
                        # leaf_gate_classes — multiply the clause boost
                        ab = getattr(a, "boost", 1.0)
                        if ab != 1.0:
                            has_boost = True
                        if isinstance(a, _FldLeaf):
                            # field-scoped term member (round 4): match
                            # and score in the field's namespace with
                            # the field's own norms
                            for t in tokenize_text(a.text):
                                nt = f"{a.field}:{t}"
                                leaves.append(nt)
                                w[nt] = w.get(nt, 0.0) + c.boost * ab
                        elif isinstance(a, _ExpLeaf):
                            # Lucene MultiTermQuery scoring-boolean
                            # rewrite inside groups (round 4): a
                            # SHOULD-of-expansions, optionally
                            # field-scoped; fuzzy members keep their
                            # edit-distance similarity weights
                            exp, sims = self._expand_leaf(a)
                            if sims is not None and exp:
                                has_boost = True
                            for t in exp:
                                leaves.append(t)
                                w[t] = (w.get(t, 0.0) + c.boost * ab
                                        * (sims[t] if sims else 1.0))
                        elif isinstance(a, _PhrLeaf):
                            # a phrase atom's constituent terms (scored
                            # over the phrase's own match set via its
                            # gate), in the field namespace when scoped
                            pre = (f"{a.field}:" if a.field
                                   and a.field != "content" else "")
                            for t in tokenize_text(a.text):
                                nt = pre + t
                                leaves.append(nt)
                                w[nt] = w.get(nt, 0.0) + c.boost * ab
                        elif isinstance(a, _TrmLeaf):
                            for t in tokenize_text(a.text):
                                leaves.append(t)
                                w[t] = w.get(t, 0.0) + c.boost * ab
                        else:
                            for t in tokenize_text(a):
                                leaves.append(t)
                                w[t] = w.get(t, 0.0) + c.boost
                    lk = self._df_lookup(leaves)
                    exist = [t for t in dict.fromkeys(leaves) if t in lk]
                    if not gates:
                        should_terms += exist
                        # duplicate leaves in a class sum their boosts
                        # (Lucene duplicate-clause scoring, as at top
                        # level); fuzzy weights ride the same dict
                        for t in exist:
                            boost_acc[t] = boost_acc.get(t, 0.0) + w[t]
                    elif exist:
                        gated_specs.append(
                            (gates, exist, {t: w[t] for t in exist}))
                if c.occur == "+":
                    m = self._match_tree(tree)
                    if m is None:
                        return empty
                    allow_sets.append(m)
                # bare pure-SHOULD nested groups flatten with no allowlist:
                # candidates = the SHOULD union, identical semantics
            else:
                # round 4: every expansion kind accepts a field scope —
                # the expansion scans the field's `field:token` namespace
                # and matches the bare token (MultiFieldQueryParser parity)
                fld = (c.field if c.field and c.field != "content"
                       else "")
                sims: dict[str, float] | None = None
                if c.kind == "regexp":
                    exp = self.expand_regexp(c.text, field=fld)
                elif c.kind == "prefix":
                    exp = self.expand_prefix(ns(c.text.lower()))
                elif c.kind == "wildcard":
                    exp = self.expand_wildcard(c.text.lower(), field=fld)
                else:
                    pat = c.text.lower()
                    pairs = self.expand_fuzzy_dists(pat, max_edits=c.num,
                                                    field=fld)
                    exp = [t for t, _ in pairs]
                    # Lucene FuzzyQuery similarity boost (round 4:
                    # COVERAGE U2f closed): expansions down-weighted
                    # by edit distance; distances are on the bare token
                    pre = f"{fld}:" if fld else ""
                    sims = {t: 1.0 - d / min(len(pat),
                                             len(t) - len(pre))
                            for t, d in pairs}
                    has_boost = has_boost or (bool(exp) and c.occur != "-")
                if c.occur == "-":
                    # -foo* / -fuzz~1 / -/re.ex/: matching-only, so De
                    # Morgan over the expansion union = deny each term
                    deny_terms += exp
                    continue
                if not exp:
                    if c.occur == "+":
                        return empty  # a MUST clause that can match nothing
                    continue
                should_terms += exp
                if sims is None:
                    add_boost(exp, c.boost)
                else:
                    for t in exp:
                        boost_acc[t] = (boost_acc.get(t, 0.0)
                                        + c.boost * sims[t])
                if c.occur == "+":
                    allow_sets.append(
                        self._match_terms(exp, conjunctive=False))
        allow_df: DataFrame | None = None
        for s in allow_sets:
            allow_df = s if allow_df is None else allow_df.join(s, "doc_id")
        deny_ids: DataFrame | None = None
        for s in deny_id_sets:
            deny_ids = s if deny_ids is None else deny_ids.union(s)
        # no .distinct(): _pseudo_rows_df np.unique's per range anyway
        if matchall_boost:
            # *:* — Lucene MatchAllDocsQuery. Alone (or with only range
            # / MUST_NOT / group filters): every live doc (minus
            # tombstones and deny sets, intersected with the filters)
            # at constant score Σ boosts, deterministic doc_id order.
            # Beside scoring clauses (round 4, final — exact
            # BooleanQuery mixing): every scored doc gains the
            # constant, and when no MUST scoring clause restricts the
            # match set, the remaining live docs join at exactly the
            # constant. BM25 contributions are strictly positive, so
            # scored docs always outrank constant-only docs; the final
            # top-k is therefore the scorer's top-k plus doc_id-ordered
            # padding, and the padding anti-join is complete whenever
            # it matters (a scorer that filled k rows makes the padding
            # moot; one that did not has returned its FULL match set).
            ids = self.docmap().select("doc_id")
            if allow_df is not None:
                ids = ids.join(allow_df, "doc_id")
            pad_deny = deny_ids
            if deny_terms:
                m = self._match_terms(deny_terms, conjunctive=False)
                pad_deny = m if pad_deny is None else pad_deny.union(m)
            if pad_deny is not None:
                ids = ids.join(pad_deny.select("doc_id"), "doc_id",
                               "left_anti")
            from ..ops.maintenance import delete_list_path, read_deletes
            import os as _os
            if _os.path.exists(delete_list_path(self.root)):
                ids = ids.join(
                    F.broadcast(read_deletes(self.spark, self.root)),
                    "doc_id", "left_anti")
            mb = F.lit(float(matchall_boost))
            if not (must_terms or should_terms or phrase_specs
                    or gated_specs):
                out = ids.withColumn("score", mb).orderBy("doc_id")
                return out.limit(k) if k is not None else out
            if gated_specs:
                scored = self._gated_sum(k, gated_specs, phrase_specs,
                                         must_terms, should_terms,
                                         deny_terms, allow_df, deny_ids,
                                         boost_acc, has_boost)
            else:
                scored = self._dispatch_score(
                    k, phrase_specs, must_terms, should_terms,
                    deny_terms, allow_df, deny_ids, boost_acc,
                    has_boost)
            scored = ((empty if scored is None else scored)
                      .withColumn("score", F.col("score") + mb))
            if must_terms or any(oc == "+"
                                 for *_, oc in phrase_specs):
                # a MUST scoring clause already bounds the match set —
                # *:* only shifts every score by the constant
                return scored
            pad = (ids.join(scored.select("doc_id"), "doc_id",
                            "left_anti").withColumn("score", mb))
            if k is None:
                # unsorted, like every other k=None scoring frame
                return scored.unionByName(pad)
            return (scored.unionByName(pad.orderBy("doc_id").limit(k))
                    .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
        if ((allow_df is not None or deny_ids is not None)
                and not phrase_specs and not gated_specs
                and not must_terms and not should_terms):
            raise ValueError(
                "query has only non-scoring filter clauses (range/group); "
                "add a scoring term or use search_fields/browse_sorted")

        if gated_specs:
            return self._gated_sum(k, gated_specs, phrase_specs,
                                   must_terms, should_terms, deny_terms,
                                   allow_df, deny_ids, boost_acc,
                                   has_boost)

        out = self._dispatch_score(k, phrase_specs, must_terms,
                                   should_terms, deny_terms, allow_df,
                                   deny_ids, boost_acc, has_boost)
        return out if out is not None else empty

    def _dispatch_score(self, k: int | None, phrase_specs, must_terms,
                        should_terms, deny_terms, allow_df, deny_ids,
                        boost_acc, has_boost) -> "DataFrame | None":
        """The classic-query scoring dispatch shared by the direct path
        and the gated-sum base frame: phrase-cogroup when any phrase
        clause exists, else the must/should term scorers. Returns None
        when there is no scoring clause at all (caller decides)."""
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if phrase_specs:
            if deny_terms:
                # deny TERMS join the id channel in phrase mode (the
                # phrase scorer has no per-term deny decode path)
                m = self._match_terms(deny_terms, conjunctive=False)
                deny_ids = m if deny_ids is None else deny_ids.union(m)
            # one whole-words cogroup pass: phrases + bare MUST terms are
            # MUST clauses, bare SHOULD terms (round 4) ride as
            # scoring-only SHOULD 1-token clauses — exact Lucene
            # BooleanQuery occur semantics across clauses. A SHOULD term
            # that is also a MUST rider is dropped (its boost already
            # summed into the MUST clause — the duplicate-clause rule).
            raw = ([(f, seq, sl, b, "+" if oc == "+" else "")
                    for f, seq, sl, b, oc in phrase_specs]
                   + [("" if ":" not in t else t.split(":", 1)[0],
                       [t], 0, boost_acc.get(t, 1.0), "+")
                      for t in dict.fromkeys(must_terms)]
                   + [("" if ":" not in t else t.split(":", 1)[0],
                       [t], 0, boost_acc.get(t, 1.0), "")
                      for t in dict.fromkeys(should_terms)
                      if t not in set(must_terms)])
            all_terms = list(dict.fromkeys(
                t for _, seq, _, _, _ in raw for t in seq))
            df_by_term = self._df_lookup(all_terms)
            # a MUST clause term absent corpus-wide → nothing matches; an
            # absent-term SHOULD clause can never score — drop it
            if any(t not in df_by_term
                   for _, seq, _, _, oc in raw if oc == "+" for t in seq):
                return empty
            raw = [e for e in raw if all(t in df_by_term for t in e[1])]
            idf_by_term = {t: _idf(self.meta.n_docs, df_by_term[t])
                           for t in all_terms if t in df_by_term}
            sent_of = {f: (f + ":" if f and f != "content" else DOCLEN_TERM)
                       for f, _, _, _, _ in raw}
            avgdl_of = self._avgdl_by_sentinel(
                sorted(set(sent_of.values())))
            pclauses: list[PhraseClause] = [
                (seq, list(dict.fromkeys(seq)), sent_of[f],
                 avgdl_of[sent_of[f]]) for f, seq, _, _, _ in raw]
            return self._phrase_clauses_topk(
                pclauses, idf_by_term, k, allow_df,
                slop=[sl for _, _, sl, _, _ in raw],
                deny_ids=deny_ids,
                boosts=([b for _, _, _, b, _ in raw]
                        if has_boost else None),
                occurs=[oc for _, _, _, _, oc in raw])

        must = list(dict.fromkeys(must_terms))
        should = list(dict.fromkeys(should_terms))
        boosts = boost_acc if has_boost else None
        if must and not should:
            return self._score_terms(must, k, allow_df, conjunctive=True,
                                     deny=deny_terms or None, boosts=boosts,
                                     deny_ids=deny_ids)
        if should and not must:
            return self._score_terms(should, k, allow_df, conjunctive=False,
                                     deny=deny_terms or None, boosts=boosts,
                                     deny_ids=deny_ids)
        if must and should:
            m = self._match_terms(must, conjunctive=True)
            allow_df = m if allow_df is None else allow_df.join(m, "doc_id")
            both = list(dict.fromkeys(must + should))
            return self._score_terms(both, k, allow_df, conjunctive=False,
                                     deny=deny_terms or None, boosts=boosts,
                                     deny_ids=deny_ids)
        return None

    def _gated_sum(self, k: int | None, gated_specs, phrase_specs,
                   must_terms, should_terms, deny_terms, allow_df,
                   deny_ids, boost_acc, has_boost) -> DataFrame:
        """Exact Lucene BooleanQuery scoring when nested groups carry
        GATED leaf classes (a SHOULD-positioned structured subgroup —
        the one shape flatten-scoring gets wrong, round-3 VERDICT
        'missing #1'): the base clauses score once at k=None, each gated
        class scores k=None over its gates' match-set intersection, and
        the frames SUM per doc — a leaf under an unmatched subgroup is
        stranded (contributes 0), exactly Lucene's semantics. All passes
        stay distributed (score-all frames union → one partial-agg sum
        shuffle → TakeOrdered k); candidates never exceed the query's
        match set because every pass carries the top-level allowlist.

        Top-level MUST clauses (bare terms and phrases) restrict EVERY
        pass: their match sets fold into the gated allowlist, so a doc
        failing a MUST never scores through a group back door."""
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        gate_allow = allow_df
        if must_terms:
            uniq = list(dict.fromkeys(must_terms))
            if any(t not in self._df_lookup(uniq) for t in uniq):
                return empty  # an absent MUST term matches nothing
            mm = self._match_terms(uniq, conjunctive=True)
            gate_allow = (mm if gate_allow is None
                          else gate_allow.intersect(mm))
        for f, seq, sl, _b, oc in phrase_specs:
            if oc != "+":
                continue  # a SHOULD phrase scores via the base frame only
            pm = self._phrase_match_ids(f or None, seq, slop=sl)
            if pm is None:
                return empty  # a MUST phrase term absent corpus-wide
            gate_allow = (pm if gate_allow is None
                          else gate_allow.intersect(pm))
        frames: list[DataFrame] = []
        base = self._dispatch_score(None, phrase_specs, must_terms,
                                    should_terms, deny_terms, allow_df,
                                    deny_ids, boost_acc, has_boost)
        if base is not None:
            frames.append(base)
        from ..tokenizer import tokenize_text
        from .parser import PhraseLeaf
        for gates, toks_g, wts in gated_specs:
            gm: DataFrame | None = None
            dead = False
            for g in gates:
                if isinstance(g, PhraseLeaf):
                    # a phrase leaf gates its own constituent terms on
                    # the phrase's exact match set (round 4) — in the
                    # field's namespace when scoped (round 4, final)
                    seq = tokenize_text(g.text)
                    if g.field and g.field != "content":
                        seq = [f"{g.field}:{t}" for t in seq]
                    s = self._phrase_match_ids(
                        g.field or None, seq, slop=g.slop)
                else:
                    s = self._match_tree(g)
                if s is None:
                    dead = True  # a gate that can never match
                    break
                gm = s if gm is None else gm.intersect(s)
            if dead:
                continue
            allow_g = (gm if gate_allow is None
                       else gm.intersect(gate_allow))
            frames.append(self._score_terms(
                toks_g, None, allow_g, conjunctive=False,
                deny=deny_terms or None,
                boosts=(wts if has_boost else None),
                deny_ids=deny_ids))
        if not frames:
            return empty
        tot = frames[0]
        for fdf in frames[1:]:
            tot = tot.unionByName(fdf)
        tot = tot.groupBy("doc_id").agg(F.sum("score").alias("score"))
        if k is None:
            return tot
        return tot.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def facet_counts(self, query: str, field: str, mode: str = "and",
                     must_not: str | None = None) -> DataFrame:
        """Facet counts over ALL matching documents (Lucene faceting, not a
        top-k post-filter): (``field``, cnt) ordered (cnt desc, value asc).
        The match set flows straight into a partially-aggregated groupBy —
        the shuffle carries (value, partial count) rows only; nothing is
        driver-materialized. ``mode="lucene"`` (round 4) facets a full
        classic query string via the score-all substrate."""
        if mode == "lucene":
            ids = self.query_string(query, k=None).select("doc_id")
        else:
            ids = self.match_ids(query, mode=mode, must_not=must_not)
        import os as _os
        dm = self.docmap()
        return (ids.join(dm.select("doc_id", field), "doc_id")
                .groupBy(field).agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc(field)))

    def facet_ranges(self, query: str, field: str,
                     ranges: list[tuple[str, float, float]],
                     mode: str = "and",
                     must_not: str | None = None) -> DataFrame:
        """Lucene ``LongRangeFacetCounts`` / ``DoubleRangeFacetCounts``
        analog: matching-doc counts per labeled INCLUSIVE [lo, hi] range
        over a numeric docmap column. Like Lucene's Range facets, ranges
        may overlap (a doc counts once per range it falls in) and
        zero-count ranges still report (cnt 0).

        Distributed shape: the match set joins the docmap column once,
        then a BROADCAST theta-join against the (tiny, driver-supplied)
        range table fans each value into its ranges — partial counts
        combine map-side, so the shuffle carries at most ``len(ranges)``
        rows per task. Returns (bucket, cnt) ordered bucket asc."""
        if not ranges:
            raise ValueError("facet_ranges needs at least one range")
        ids = self.match_ids(query, mode=mode, must_not=must_not)
        dm = self.docmap()
        from pyspark.sql.types import NumericType
        if field not in dm.columns or not isinstance(
                dm.schema[field].dataType, NumericType):
            raise ValueError(f"facet_ranges needs a numeric docmap "
                             f"column, got: {field!r}")
        rng = self.spark.createDataFrame(
            [(str(lbl), float(lo), float(hi)) for lbl, lo, hi in ranges],
            "bucket string, lo double, hi double")
        vals = ids.join(dm.select("doc_id", field), "doc_id")
        counts = (vals.join(F.broadcast(rng),
                            (F.col(field) >= F.col("lo"))
                            & (F.col(field) <= F.col("hi")))
                  .groupBy("bucket").agg(F.count("*").alias("cnt")))
        return (rng.select("bucket").join(counts, "bucket", "left")
                .select("bucket",
                        F.coalesce("cnt", F.lit(0)).cast("long")
                        .alias("cnt"))
                .orderBy(F.asc("bucket")))

    def score_all(self, query: str, mode: str = "and",
                  must_not: str | None = None) -> DataFrame:
        """Every matching doc with its exact BM25 score — no top-k cut
        (Lucene's collect-all ``Collector``; the substrate grouping and
        dismax rank over). Same scorers, tombstones, and deny machinery as
        ``topk``; the per-range cut is disabled (k=None), so the frame is
        the full match set, unsorted. At 100 TB this is inherently
        match-set-sized — rank with a downstream window/TakeOrdered, never
        a driver collect."""
        terms = query_terms(query)
        deny = query_terms(must_not) if must_not else []
        if not terms:
            return self.spark.createDataFrame([], "doc_id long, score double")
        if deny and mode != "or" and set(terms) & set(deny):
            return self.spark.createDataFrame([], "doc_id long, score double")
        if deny and mode == "or":
            terms = [t for t in terms if t not in set(deny)]
            if not terms:
                return self.spark.createDataFrame(
                    [], "doc_id long, score double")
        return self._score_terms(terms, None, conjunctive=(mode != "or"),
                                 deny=deny or None)

    def grouped_topk(self, query: str, group_field: str,
                     n_groups: int = 10, docs_per_group: int = 3,
                     mode: str = "and",
                     must_not: str | None = None,
                     sort_within_group: "str | list[str] | None" = None,
                     within_ascending: "bool | list[bool]" = False
                     ) -> DataFrame:
        """Lucene grouping-module ``GroupingSearch`` analog (top groups +
        top docs within each group — search-time collapse, e.g. "best 2
        hits per repo"): groups rank by their best hit in the global
        (score desc, doc_id asc) order; within a group docs rank the same
        way by default, cut to ``docs_per_group``.

        ``sort_within_group`` (round 4, final — Lucene
        ``GroupingSearch.setSortWithinGroup``): order docs INSIDE each
        group by stored field(s) instead of relevance (per-key direction
        via ``within_ascending``, doc_id asc tie-break); group ranking
        stays by best-hit score (Lucene's default group sort), so the
        two orders are independent exactly as in Lucene.

        Distributed shape: score-ALL matches (grouping must see every
        group's best hit — exactly Lucene's two-pass grouping collector),
        one shuffle to join the group column, window(s) partitioned BY
        GROUP (skew-bounded: each partition sorts one group's matches;
        with a within-sort the second window reuses the same exchange),
        then the ``n_groups`` heads cut via TakeOrderedAndProject and
        broadcast back — the final join is map-side. No global sort of
        the match set anywhere.

        Returns (group_rank, <group_field>, doc_rank, doc_id, score
        [, <within fields>]) ordered (group_rank, doc_rank)."""
        from pyspark.sql import Window
        scored = self.score_all(query, mode=mode, must_not=must_not)
        dm = self.docmap()
        if group_field not in dm.columns:
            raise ValueError(f"unknown group field: {group_field!r}")
        within = ([sort_within_group] if isinstance(sort_within_group, str)
                  else list(sort_within_group or []))
        w_asc = (list(within_ascending)
                 if isinstance(within_ascending, (list, tuple))
                 else [bool(within_ascending)] * len(within))
        if len(w_asc) != len(within):
            raise ValueError(
                "within_ascending must match sort_within_group")
        bad = [f for f in within if f not in dm.columns or f == group_field]
        if bad:
            raise ValueError(f"bad within-group sort field(s): {bad}")
        cols = list(dict.fromkeys(["doc_id", group_field, *within]))
        g = scored.join(dm.select(*cols), "doc_id")
        w_score = (Window.partitionBy(group_field)
                   .orderBy(F.desc("score"), F.asc("doc_id")))
        if within:
            keys = [F.asc(f) if a else F.desc(f)
                    for f, a in zip(within, w_asc)]
            w_doc = (Window.partitionBy(group_field)
                     .orderBy(*keys, F.asc("doc_id")))
            # heads need every group's best-SCORE hit, which a
            # field-ordered top-docs_per_group cut may not retain
            heads = (g.withColumn("_r", F.row_number().over(w_score))
                     .filter(F.col("_r") == 1))
        else:
            w_doc = w_score
            heads = None
        ranked = (g.withColumn("doc_rank", F.row_number().over(w_doc))
                  .filter(F.col("doc_rank") <= docs_per_group))
        if heads is None:
            heads = ranked.filter(F.col("doc_rank") == 1)
        # heads: n_groups rows after the TakeOrdered cut — the unpartitioned
        # rank window below runs on that tiny frame only
        heads = (heads
                 .select(group_field, F.col("score").alias("_hs"),
                         F.col("doc_id").alias("_hd"))
                 .orderBy(F.desc("_hs"), F.asc("_hd")).limit(n_groups))
        wg = Window.orderBy(F.desc("_hs"), F.asc("_hd"))
        heads = (heads.withColumn("group_rank", F.row_number().over(wg))
                 .select(group_field, "group_rank"))
        return (ranked.join(F.broadcast(heads), group_field)
                .select("group_rank", group_field, "doc_rank",
                        "doc_id", "score", *within)
                .orderBy("group_rank", "doc_rank"))

    def explain(self, query: str, k: int = 10,
                mode: str = "and") -> DataFrame:
        """Lucene ``IndexSearcher.explain`` analog: the per-(doc, term) BM25
        score breakdown for the top-k hits of a content query (``mode``
        "and"/"or" selects the hit set; the breakdown itself lists every
        query term PRESENT in the doc either way, and a hit's score is the
        sum of its rows' contribs in both modes) —
        one row per (hit, query term) with every quantity Lucene's
        ``Explanation`` tree reports (tf, doclen, df, idf, and the term's
        score contribution; the hit's score is the sum of its contribs).

        Distributed shape: the k hit ids are control-plane (k rows); the
        breakdown re-reads ONLY the postings rows of the query terms + the
        DOCLEN norms sentinel in the hits' ranges (bucket + range pruned —
        parquet partition pruning on disk, filter on the cached relation),
        decodes ONLY blocks overlapping the hit ids (skip-list jump), and
        emits (doc_id, term, tf) rows from one mapInPandas pass. df/idf are
        dictionary lookups; the contribution is a Catalyst expression over
        the joined columns — no Python in the arithmetic.

        Returns (doc_id, term, tf, doclen, df, idf, contrib) ordered
        (doc_id asc, term asc); idf/contrib rounded to 6dp."""
        terms = query_terms(query)
        empty = self.spark.createDataFrame(
            [], "doc_id long, term string, tf long, doclen long, "
                "df long, idf double, contrib double")
        if not terms:
            return empty
        docs = sorted(int(r["doc_id"]) for r in
                      self.topk(query, k, mode).select("doc_id").collect())
        stats = self._stats_lookup(terms)
        terms = [t for t in terms if t in stats]
        if not docs or not terms:
            return empty
        if mode == "and" and len(terms) < len(set(query_terms(query))):
            return empty  # a MUST term absent from the corpus
        meta = self.meta
        ranges = sorted({d // meta.range_size for d in docs})
        fetch = terms + [DOCLEN_TERM]
        if self._cached:
            post = self.post.filter(F.col("term").isin(fetch)
                                    & F.col("range_id").isin(ranges))
        else:
            bmap = _buckets_of(fetch, meta.n_buckets, self.spark)
            post = self.post.filter(
                F.col("bucket").isin(sorted({bmap[t] for t in fetch}))
                & F.col("term").isin(fetch)
                & F.col("range_id").isin(ranges))
        allow = np.asarray(docs, dtype=np.int64)
        lo, hi = int(allow[0]), int(allow[-1])

        def gen(batches):
            for pdf in batches:
                od, ot, otf = [], [], []
                for row in pdf.itertuples(index=False):
                    d, t = decode_blocks_overlapping(
                        _ep_from_row(row), lo, hi)
                    m = _in_sorted(d, allow)
                    if m.any():
                        od.append(d[m])
                        otf.append(t[m])
                        ot.extend([row.term] * int(m.sum()))
                if od:
                    yield pd.DataFrame({"doc_id": np.concatenate(od),
                                        "term": ot,
                                        "tf": np.concatenate(otf)})

        raw = post.select(*SCORER_COLS).mapInPandas(
            gen, "doc_id long, term string, tf long")
        dl = (raw.filter(F.col("term") == DOCLEN_TERM)
              .select("doc_id", F.col("tf").alias("doclen")))
        tdf = self.spark.createDataFrame(
            [(t, stats[t][0]) for t in sorted(set(terms))],
            "term string, df long")
        return (raw.filter(F.col("term") != DOCLEN_TERM)
                .join(F.broadcast(dl), "doc_id")
                .join(F.broadcast(tdf), "term")
                .withColumn("n_docs", F.lit(float(meta.n_docs)))
                .withColumn("avgdl", F.lit(float(meta.avgdl)))
                .withColumn("idf", F.round(F.log1p(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)), 6))
                .withColumn("contrib", F.round(bm25_score_expr(), 6))
                .select("doc_id", "term", "tf", "doclen", "df",
                        "idf", "contrib")
                .orderBy(F.asc("doc_id"), F.asc("term")))

    def suggest(self, term: str, n: int = 5, max_edits: int = 2) -> DataFrame:
        """Lucene ``DirectSpellChecker`` analog (did-you-mean): dictionary
        terms within Levenshtein distance ``max_edits`` of ``term`` (never
        the term itself), ranked (distance asc, df desc, suggestion asc),
        top ``n``. The scan is vocabulary-sized with the length-band
        pushdown (|len(t) − len(q)| ≤ max_edits) reaching the term_stats
        parquet scan; the distance runs JVM-side (``F.levenshtein``) — no
        Python anywhere. Namespaced ``field:`` terms and sentinels are never
        suggestions. Returns (suggestion, dist, df)."""
        term = term.strip().lower()
        if not term:
            return self.spark.createDataFrame(
                [], "suggestion string, dist int, df long")
        return (self.stats
                .filter((F.length("term") >= F.lit(len(term) - max_edits))
                        & (F.length("term") <= F.lit(len(term) + max_edits))
                        & ~F.col("term").contains(":")
                        & (F.col("term") != DOCLEN_TERM))
                .withColumn("dist",
                            F.levenshtein(F.col("term"), F.lit(term)))
                .filter((F.col("dist") >= 1) & (F.col("dist") <= max_edits))
                .select(F.col("term").alias("suggestion"),
                        F.col("dist").cast("int").alias("dist"),
                        F.col("df").cast("long").alias("df"))
                .orderBy(F.asc("dist"), F.desc("df"), F.asc("suggestion"))
                .limit(n))


def bm25_topk(spark: SparkSession, root: str, query: str, k: int = 10,
              mode: str = "and", slop: int = 0,
              min_should_match: int = 1) -> DataFrame:
    """Top-k BM25 over the compressed index; rank-identical to
    query.oracle.bm25_topk_oracle. Returns (doc_id, score). One-shot
    convenience wrapper — use QuerySession for serving."""
    return QuerySession(spark, root, cache=False).topk(
        query, k, mode, slop=slop, min_should_match=min_should_match)


def federated_topk(spark: SparkSession, roots: "list[str]", query: str,
                   k: int = 10, mode: str = "and", slop: int = 0,
                   min_should_match: int = 1,
                   sessions: "list[QuerySession] | None" = None) -> DataFrame:
    """U1 multi-index federation: the reference keeps one Lucene index per
    drive and answers a global search by looping the query across all of
    them (``lucene/cIndex.java:59-69`` ``searchAll``, dispatched from
    ``ui/fx/cSearchTable.java:248-258``), each index scored with its OWN
    statistics. Spark shape: score each published root independently
    (per-root idf/avgdl, exactly like the reference's per-index
    ``IndexSearcher``s), tag rows with the root ordinal, and merge the
    per-root top-k frames through ONE ``TakeOrderedAndProject`` — exact,
    because every root's contribution to the federated top-k is contained
    in that root's own top-k. No cross-root shuffle: the merge moves at
    most ``len(roots) * k`` rows.

    Returns (root_id, doc_id, score) ordered
    (score desc, doc_id asc, root_id asc), limit k. Pass ``sessions``
    (parallel to ``roots``) to reuse cached QuerySessions when serving.
    """
    if not roots:
        raise ValueError("federated_topk needs at least one index root")
    frames = []
    for i, root in enumerate(roots):
        qs = (sessions[i] if sessions is not None
              else QuerySession(spark, root, cache=False))
        frames.append(
            qs.topk(query, k, mode, slop=slop,
                    min_should_match=min_should_match)
            .select(F.lit(i).alias("root_id"), "doc_id", "score"))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return (out.orderBy(F.desc("score"), F.asc("doc_id"), F.asc("root_id"))
            .limit(k))


METADATA_FIELDS = ("repo", "path", "commit", "lang")

#: allowlist-vs-overfetch crossover: below this many metadata-matching docs
#: the exact allowlist is shuffled into the scorer; above it, candidates are
#: fetched with doubling (both paths are exact — see search_fields).
ALLOWLIST_MAX = 100_000


def search_fields(spark: SparkSession, root: str, fields: dict[str, str],
                  k: int = 10, mode: str = "and",
                  session: QuerySession | None = None,
                  ranges: dict[str, tuple] | None = None) -> DataFrame:
    """Reference-parity multi-field conjunctive search
    (``cLuceneIndexReader.java:272-397``: one MUST clause per non-empty UI
    field — Path/Filename/Extension/Category…). Spark shape: the ``content``
    clause runs through the inverted index (BM25-ranked); metadata clauses
    (repo/path/commit/lang — the Path/Filename/Extension/Category analogs)
    become docmap predicates. EXACT like the reference's conjunction: a
    selective metadata predicate is pushed INTO the range scorer as a
    per-range doc allowlist (ALLOW_TERM pseudo-postings), so the top-k is
    over the true conjunction; an unselective one (matched docs >
    ALLOWLIST_MAX, where shuffling the allowlist would approach a corpus
    scan) falls back to over-fetching with doubling until k exact survivors
    or the index is exhausted. Empty-valued fields are ignored (reference
    P1, ``cSearchTable.java:222-246``).

    ``ranges`` adds Lucene range clauses (``IntPoint.newRangeQuery`` /
    ``TermRangeQuery``): ``{field: (lo, hi)}`` keeps docs with
    ``lo <= docmap[field] <= hi`` (either bound may be None for
    open-ended). Range predicates ride the same exact allowlist /
    over-fetch machinery as the metadata clauses, and push down to the
    docmap parquet scan as ordinary comparison filters.

    Returns (doc_id, score, repo, path, commit, lang) ordered
    (score desc, doc_id asc), at most k rows.
    """
    fields = {f: v for f, v in fields.items() if v and str(v).strip()}
    meta_preds = {f: v for f, v in fields.items() if f in METADATA_FIELDS}
    ranges = {f: b for f, b in (ranges or {}).items()
              if b is not None and (b[0] is not None or b[1] is not None)}
    content_q = fields.get("content", "")
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    sess = session or QuerySession(spark, root, cache=False)

    def apply_meta(df: DataFrame) -> DataFrame:
        for f, v in meta_preds.items():
            df = df.filter(F.lower(F.col(f)).contains(str(v).lower()))
        for f, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.filter(F.col(f) >= lo)
            if hi is not None:
                df = df.filter(F.col(f) <= hi)
        return df

    def with_deletes(df: DataFrame) -> DataFrame:
        if sess.del_rows is None:
            return df
        from ..ops.maintenance import read_deletes
        return df.join(F.broadcast(read_deletes(spark, root)),
                       "doc_id", "left_anti")

    out_cols = ("doc_id", "score", "repo", "path", "commit", "lang")

    if not content_q:
        # pure metadata search: predicate pushdown on the docmap scan,
        # deterministic doc_id order (no scores)
        return (with_deletes(apply_meta(docmap))
                .select("doc_id", F.lit(0.0).alias("score"),
                        "repo", "path", "commit", "lang")
                .orderBy("doc_id").limit(k))

    if not meta_preds and not ranges:
        hits = sess.topk(content_q, k, mode)
        return (docmap.join(F.broadcast(hits), "doc_id")
                .select(*out_cols)
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    matched = apply_meta(docmap).select("doc_id")
    n_matched = matched.count()
    if n_matched == 0:
        return spark.createDataFrame(
            [], "doc_id long, score double, repo string, path string, "
                "commit string, lang string")
    if n_matched <= ALLOWLIST_MAX:
        hits = sess.topk(content_q, k, mode, allow=matched)
        return (docmap.join(F.broadcast(hits), "doc_id")
                .select(*out_cols)
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))

    # unselective predicate: doubling over-fetch, exact termination — stop
    # when k candidates survive the filter OR the index ran out of hits
    fetch = max(k * 10, 100)
    while True:
        hits = sess.topk(content_q, fetch, mode)
        flt = (apply_meta(docmap.join(F.broadcast(hits), "doc_id"))
               .select(*out_cols))
        n_got = hits.count()
        if flt.count() >= k or n_got < fetch:
            return flt.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        fetch *= 4


def search_fields_parsed(spark: SparkSession, root: str,
                         fields: dict[str, str], k: int = 10,
                         session: QuerySession | None = None) -> DataFrame:
    """Parsed (analyzed) multi-field search THROUGH the index — the
    reference's ``MultiFieldQueryParser`` mode (``cLuceneIndexReader.java:
    320-338``): every clause, metadata included, is tokenized with the
    pinned code-aware analyzer and matched/RANKED against the namespaced
    index terms with per-field norms (QuerySession.topk_parsed). This is
    token-exact semantics — ``{"path": "theFile"}`` matches camelCase path
    components the substring path (search_fields) cannot. Returns
    (doc_id, score, repo, path, commit, lang), at most k rows."""
    sess = session or QuerySession(spark, root, cache=False)
    hits = sess.topk_parsed(fields, k)
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    return (docmap.join(F.broadcast(hits), "doc_id")
            .select("doc_id", "score", "repo", "path", "commit", "lang")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def search_fields_whole_words(spark: SparkSession, root: str,
                              fields: dict[str, str], k: int = 10,
                              session: QuerySession | None = None
                              ) -> DataFrame:
    """Reference "whole words" search (``cLuceneIndexReader.java:285-301``):
    a BooleanQuery of one PhraseQuery per non-empty field, every clause
    MUST, scores summed — here each field's phrase runs over its namespaced
    positional postings with per-field norms (QuerySession.topk_whole_words)
    and the hits hydrate from the docmap. Returns
    (doc_id, score, repo, path, commit, lang), at most k rows."""
    sess = session or QuerySession(spark, root, cache=False)
    hits = sess.topk_whole_words(fields, k)
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    return (docmap.join(F.broadcast(hits), "doc_id")
            .select("doc_id", "score", "repo", "path", "commit", "lang")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def browse_sorted(spark: SparkSession, root: str,
                  field: "str | list[str]",
                  k: int = 50,
                  ascending: "bool | list[bool]" = False,
                  query: str | None = None, mode: str = "and",
                  after: "tuple | None" = None,
                  session: QuerySession | None = None) -> DataFrame:
    """Lucene ``Sort(SortField)``: results ordered by stored fields
    instead of relevance. ``field`` may be a single field or a LIST —
    Lucene's multi-key ``Sort(SortField...)``, keys compared left to
    right (round 4, final); ``ascending`` then applies per key (one
    bool each) or to every key (a single bool). With ``query``, the
    FULL conjunctive/union match set (``match_ids`` — tombstone-aware)
    is hydrated from the docmap and ordered by (*fields, doc_id);
    without, the whole docmap browses in field order. The order+limit
    compiles to TakeOrderedAndProject (per-partition top-k then a k-row
    merge on the driver) — no global sort materialization at any corpus
    size. Returns (doc_id, <fields>, repo, path, lang).

    ``after`` pages (Lucene ``searchAfter`` under a ``Sort``, round 4
    final): the previous page's last (*field values, doc_id) is the
    pivot, and only rows STRICTLY after it in the sort order survive —
    a lexicographic composite-key predicate (per-key comparison
    direction follows ``ascending``) applied BEFORE the per-partition
    cut, so no page depth ever over-fetches. The first key's comparison
    is a plain column predicate the parquet reader can push."""
    fields = [field] if isinstance(field, str) else list(field)
    ascs = (list(ascending) if isinstance(ascending, (list, tuple))
            else [bool(ascending)] * len(fields))
    if not fields or len(ascs) != len(fields):
        raise ValueError(
            "field/ascending must be non-empty and the same length")
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    missing = [f for f in fields if f not in docmap.columns]
    if missing:
        raise ValueError(f"unknown sort field(s): {missing}")
    sess = session or QuerySession(spark, root, cache=False)
    if query is not None:
        ids = sess.match_ids(query, mode=mode)
        docmap = docmap.join(ids, "doc_id")
    elif sess.del_rows is not None:
        from ..ops.maintenance import read_deletes
        docmap = docmap.join(F.broadcast(read_deletes(spark, root)),
                             "doc_id", "left_anti")
    if after is not None:
        if len(after) != len(fields) + 1:
            raise ValueError(
                "after must supply one value per sort field plus the "
                "pivot doc_id")
        # strictly-after in lexicographic sort order: key_i beats the
        # pivot on the first differing key (direction per `ascending`),
        # with doc_id asc as the final tie-break
        keys_cmp = ([(F.col(f), v, a)
                     for f, v, a in zip(fields, after[:-1], ascs)]
                    + [(F.col("doc_id"), int(after[-1]), True)])
        pred = None
        eq_prefix = None
        for col, v, asc in keys_cmp:
            beat = (col > v) if asc else (col < v)
            term = beat if eq_prefix is None else eq_prefix & beat
            pred = term if pred is None else pred | term
            eq = col == v
            eq_prefix = eq if eq_prefix is None else eq_prefix & eq
        docmap = docmap.filter(pred)
    keys = [F.asc(f) if a else F.desc(f) for f, a in zip(fields, ascs)]
    cols = list(dict.fromkeys(
        ["doc_id", *fields, "repo", "path", "lang"]))
    return docmap.select(*cols).orderBy(*keys, F.asc("doc_id")).limit(k)


def highlight_topk(spark: SparkSession, root: str, query: str, k: int = 10,
                   mode: str = "and", width: int = 60,
                   session: QuerySession | None = None) -> DataFrame:
    """Lucene ``Highlighter``/``UnifiedHighlighter`` analog: top-k hits
    with a deterministic snippet of ``width`` characters centered on the
    first occurrence of the RAREST query term present in the doc (rarest =
    lowest df, ties term-asc — the most informative term, same choice
    Lucene's scorer-weighted fragmenter tends to make).

    Entirely JVM-side columnar over the k hydrated rows (a broadcast join
    plus locate/substr expressions — no Python in the loop, no re-tokenize):
    every analyzer token is a contiguous substring of the LOWERCASED
    original text (the code-aware tokenizer only inserts boundaries; it
    never rewrites characters beyond lowercasing), so a case-insensitive
    ``locate`` is guaranteed to find each present term. Returns
    (doc_id, score, snippet) ordered (score desc, doc_id asc)."""
    sess = session or QuerySession(spark, root, cache=False)
    terms = query_terms(query)
    df_by = sess._df_lookup(terms)
    rarest = sorted((t for t in terms if t in df_by),
                    key=lambda t: (df_by[t], t))
    hits = sess.topk(query, k, mode)
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    joined = docmap.join(F.broadcast(hits), "doc_id")
    low = F.lower(F.col("content"))
    pos = F.lit(1)
    for t in reversed(rarest):   # rarest-first when-chain
        p = F.locate(t, low)
        pos = F.when(p > 0, p).otherwise(pos)
    start = F.greatest(F.lit(1), pos - F.lit(width // 2))
    return (joined
            .select("doc_id", "score",
                    F.col("content").substr(start,
                                            F.lit(width)).alias("snippet"))
            .orderBy(F.desc("score"), F.asc("doc_id")))


def explain_topk(spark: SparkSession, root: str, query: str, k: int = 10,
                 mode: str = "and",
                 session: QuerySession | None = None) -> DataFrame:
    """One-shot ``QuerySession.explain`` (Lucene ``IndexSearcher.explain``)."""
    sess = session or QuerySession(spark, root, cache=False)
    return sess.explain(query, k, mode)


def spell_suggest(spark: SparkSession, root: str, term: str, n: int = 5,
                  max_edits: int = 2,
                  session: QuerySession | None = None) -> DataFrame:
    """One-shot ``QuerySession.suggest`` (Lucene ``DirectSpellChecker``)."""
    sess = session or QuerySession(spark, root, cache=False)
    return sess.suggest(term, n, max_edits)


def hydrate(spark: SparkSession, root: str, topk: DataFrame) -> DataFrame:
    """Join top-k hits back to stored fields (analog of ``searcher.doc(id)`` →
    ``eDocument.from``, R:352-359) — broadcast the k rows, not the corpus."""
    docmap = spark.read.parquet(IndexPaths(root).docmap)
    return (docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "repo", "path", "commit", "lang",
                    "size", "content_sha256")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def index_stats(spark: SparkSession, root: str) -> DataFrame:
    """Lucene ``IndexReader`` corpus statistics (``numDocs`` /
    ``Terms.size`` / ``getSumDocFreq`` / ``getSumTotalTermFreq``) read off
    the published index — one vocabulary-sized agg over term_stats, no
    postings decode. Content terms only: namespaced ``field:`` terms and
    the DOCLEN sentinel are bookkeeping, not user vocabulary. ``avgdl``
    rounds to 6dp for cross-engine comparability."""
    meta = load_meta(spark, root)
    st = spark.read.parquet(IndexPaths(root).term_stats)
    return (st.filter(~F.col("term").contains(":"))
            .agg(F.count("*").alias("vocab_size"),
                 F.sum("df").cast("long").alias("sum_doc_freq"),
                 F.sum("cf").cast("long").alias("sum_total_term_freq"))
            .withColumn("n_docs", F.lit(int(meta.n_docs)).cast("long"))
            .withColumn("avgdl", F.round(F.lit(float(meta.avgdl)), 6))
            .select("n_docs", "vocab_size", "sum_doc_freq",
                    "sum_total_term_freq", "avgdl"))

"""IVF (inverted-file) approximate nearest-neighbor search.

The second ANN scale path mandated by the task brief ("an IVF or
LSH-bucketed variant"), complementing ``ops.similarity``'s sign-sketch LSH:
where LSH buckets by data-independent hyperplanes, IVF learns the bucket
geometry from the data (spherical k-means centroids), which keeps buckets
balanced on CLUSTERED embeddings — exactly the regime where a
data-independent sketch funnels everything into a few buckets.

Not in the reference (its only similarity notion is BM25 ranking,
``lucene/cLuceneIndexReader.java:340``); first-class training-data-pipeline
operator.

Scale design (100 TB):
- **Training is control-plane cheap.** Each Lloyd iteration is ONE
  ``mapInPandas`` pass (a batch × centroids fp64 matmul per Arrow batch —
  vectorized, embarrassingly parallel, no shuffle) emitting per-partition
  partial sums: at most ``n_centroids`` rows of ``dim`` doubles per
  partition. Those partials are collected and reduced on the driver —
  ``partitions × n_centroids × dim`` doubles, independent of row count.
- **The index is (id, cluster, vec).** Persist it partitioned by
  ``cluster``: a query probing ``nprobe`` centroids prunes
  ``1 - nprobe/n_centroids`` of the corpus at the partition level before a
  single vector is read (same pruning story as the LSH sketch index, but
  with learned, balanced cells).
- **Search reads only probed cells.** Centroid scoring happens on the
  driver (``n_centroids × dim`` — control-plane), the cell scan is an exact
  in-order fp64 cosine, and top-k is Catalyst's TakeOrderedAndProject.

Determinism: seeding picks the vectors with the smallest ``xxhash64(id)``
(tie-break id), every reduction is fp64 in a sorted, explicit order, and
iteration stops on exact centroid convergence or ``max_iters`` — same input
always yields the same centroids, so results are test-stable and
oracle-reproducible.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_expr


def pick_n_centroids(n_vectors: int) -> int:
    """~sqrt(N/2) learned cells, clamped to [2, 4096]: keeps expected cell
    population ≥ ~50 at small corpora (recall) while 4096 cells × partition
    pruning covers the 10^9-vector regime (classic IVF sizing, e.g. FAISS'
    ``sqrt(N)`` guidance)."""
    if n_vectors <= 4:
        return 2
    return max(2, min(4096, int(math.sqrt(n_vectors / 2))))


def pick_nprobe(n_centroids: int) -> int:
    """Probe ALL cells below 64 (pruning 30 cells cannot pay for recall
    loss — mirrors similarity.pick_probe_radius); beyond that, ~12% of
    cells with a floor of 8 — the standard IVF recall/cost knee."""
    if n_centroids <= 64:
        return n_centroids
    return max(8, n_centroids // 8)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """L2-normalize rows; zero rows stay zero (they score 0 against every
    centroid and land deterministically in cell 0 via argmax)."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return np.divide(m, n, out=np.zeros_like(m), where=n != 0)


def _seed_centroids(emb: DataFrame, n_centroids: int,
                    id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic spread seed: the ``n_centroids`` vectors with the
    smallest ``xxhash64(id)`` (tie-break id) — a pseudo-random sample with
    no RNG state, computed as one TakeOrderedAndProject."""
    rows = (emb.select(F.col(vec_col).alias("v"),
                       F.xxhash64(F.col(id_col)).alias("h"),
                       F.col(id_col).alias("i"))
            .orderBy("h", "i").limit(n_centroids).collect())
    seeds = _unit_rows(np.asarray([r["v"] for r in rows], dtype=np.float64))
    # degenerate duplicate seeds are fine: their cells just stay empty and
    # hold position (see the empty-cell rule in train_kmeans)
    return seeds


def _assign_partials_gen(cent: np.ndarray, vec_col: str):
    """mapInPandas stage: per Arrow batch, assign rows to their max-dot
    centroid (one matmul) and accumulate per-cluster (count, vector sum)
    into ONE partials frame per partition."""
    k, dim = cent.shape

    def gen(batches):
        import pandas as pd
        from pyspark import TaskContext
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = _unit_rows(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
            a = np.argmax(m @ cent.T, axis=1)
            np.add.at(cnt, a, 1)
            np.add.at(sums, a, m)
        pid = TaskContext.get().partitionId()
        live = np.flatnonzero(cnt)
        if live.size == 0:
            return  # empty partition: 0-row frames break Arrow list casts
        yield pd.DataFrame({
            "pid": np.full(live.size, pid, dtype=np.int64),
            "cluster": live.astype(np.int64),
            "n": cnt[live],
            "vsum": [sums[c].tolist() for c in live]})

    return gen


_PARTIALS_SCHEMA = "pid long, cluster long, n long, vsum array<double>"


def train_kmeans(emb: DataFrame, n_centroids: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 max_iters: int = 8) -> np.ndarray:
    """Spherical k-means (Lloyd's on the unit sphere): assignment by max
    dot product, update = renormalized mean of assigned unit vectors.
    Empty cells keep their previous centroid (they can repopulate as
    neighbors move). Stops early on exact centroid convergence. Returns the
    (n_centroids, dim) fp64 centroid matrix — control-plane sized."""
    cent = _seed_centroids(emb, n_centroids, id_col, vec_col)
    src = emb.select(F.col(vec_col).alias(vec_col))
    for _ in range(max_iters):
        parts = src.mapInPandas(_assign_partials_gen(cent, vec_col),
                                _PARTIALS_SCHEMA).collect()
        cnt = np.zeros(cent.shape[0], dtype=np.int64)
        sums = np.zeros_like(cent)
        # fixed fp64 reduction order: sorted by (cluster, partition)
        for r in sorted(parts, key=lambda r: (r["cluster"], r["pid"])):
            cnt[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["vsum"], dtype=np.float64)
        new = cent.copy()
        live = cnt > 0
        new[live] = _unit_rows(sums[live])
        if np.array_equal(new, cent):
            break
        cent = new
    return cent


@dataclass
class IvfIndex:
    """Learned ANN index: ``assignments`` is the distributable part
    (persist partitioned by ``cluster``); ``centroids`` is control-plane
    metadata that rides the manifest (≤ 4096 × dim doubles)."""
    assignments: DataFrame           # (id, cluster, vec)
    centroids: np.ndarray            # (n_centroids, dim), unit rows


def build_ivf_index(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_centroids: int | None = None,
                    max_iters: int = 8) -> IvfIndex:
    """Train centroids, then assign every vector in one more mapInPandas
    pass. The assignment DataFrame carries ``n_centroids`` implicitly via
    the centroid matrix on the returned index."""
    if n_centroids is None:
        n_centroids = pick_n_centroids(emb.count())
    cent = train_kmeans(emb, n_centroids, id_col, vec_col, max_iters)

    def assign_gen(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            m = _unit_rows(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "cluster": np.argmax(m @ cent.T, axis=1).astype(np.int64),
                "vec": pdf[vec_col]})

    asg = emb.select(id_col, vec_col).mapInPandas(
        assign_gen, "id long, cluster long, vec array<float>")
    return IvfIndex(assignments=asg, centroids=cent)


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization + asymmetric-distance (ADC) scoring
# ---------------------------------------------------------------------------

@dataclass
class PqCodebook:
    """Product-quantizer codebook: ``sub_centroids[m]`` is the
    (n_codes, sub_dim) fp64 codeword matrix of subspace ``m``. Control-plane
    sized (M × n_codes × sub_dim doubles — e.g. 8 × 16 × 8 = 1024)."""
    sub_centroids: np.ndarray        # (M, n_codes, sub_dim)

    @property
    def m(self) -> int:
        return self.sub_centroids.shape[0]

    @property
    def n_codes(self) -> int:
        return self.sub_centroids.shape[1]


@dataclass
class IvfPqIndex:
    """IVF-PQ ANN index: ``codes`` holds ONE row per vector with its learned
    cell and M one-byte-ish PQ codes — ``4·dim`` float bytes compress to
    ``M`` small ints (e.g. 256 B → 8 B at dim=64, M=8), which is what lets
    the candidate scan of a 10^9-vector corpus stay in memory. Raw vectors
    are NOT in the index; the optional exact refine joins them back from the
    source table for the top candidates only (control-plane sized)."""
    codes: DataFrame                 # (id, cluster, codes array<int>)
    centroids: np.ndarray            # coarse (n_centroids, dim)
    codebook: PqCodebook


def _pq_partials_gen(cents: np.ndarray, vec_col: str):
    """One mapInPandas Lloyd pass covering ALL subspaces: per Arrow batch,
    assign each row's m-th slice to its nearest codeword (M small matmuls)
    and accumulate per-(subspace, code) (count, sum) partials — at most
    ``M × n_codes`` rows per partition, independent of row count."""
    M, K, sd = cents.shape

    def gen(batches):
        import pandas as pd
        from pyspark import TaskContext
        cnt = np.zeros((M, K), dtype=np.int64)
        sums = np.zeros((M, K, sd), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            mtx = _unit_rows(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
            for m in range(M):
                sub = mtx[:, m * sd:(m + 1) * sd]
                # nearest codeword by L2 == max (dot - ||c||²/2)
                a = np.argmax(sub @ cents[m].T
                              - 0.5 * (cents[m] ** 2).sum(axis=1), axis=1)
                np.add.at(cnt[m], a, 1)
                np.add.at(sums[m], a, sub)
        pid = TaskContext.get().partitionId()
        sub_i, code_i = np.nonzero(cnt)
        if sub_i.size == 0:
            return
        yield pd.DataFrame({
            "pid": np.full(sub_i.size, pid, dtype=np.int64),
            "sub": sub_i.astype(np.int64),
            "code": code_i.astype(np.int64),
            "n": cnt[sub_i, code_i],
            "vsum": [sums[s, c].tolist() for s, c in zip(sub_i, code_i)]})

    return gen


_PQ_PARTIALS_SCHEMA = "pid long, sub long, code long, n long, vsum array<double>"


def train_pq(emb: DataFrame, m_subspaces: int = 8, n_codes: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_iters: int = 8) -> PqCodebook:
    """Product-quantizer training: per-subspace k-means over the unit
    vectors' slices (codewords quantize the RAW unit vector, not the coarse
    residual — a documented simplification that keeps the quantizer
    independent of the coarse index and the training one distributed pass
    per Lloyd iteration for ALL subspaces at once). Deterministic: seeds
    are subspace slices of the xxhash-spread seed rows; fp64 reduction in
    sorted (sub, code, pid) order; early-stops on exact convergence."""
    dim = len(emb.select(vec_col).first()[0])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by M={m_subspaces}")
    sd = dim // m_subspaces
    seeds = _seed_centroids(emb, n_codes, id_col, vec_col)
    if seeds.shape[0] < n_codes:
        raise ValueError(f"need >= {n_codes} vectors to train {n_codes} codes")
    cents = np.stack([seeds[:, m * sd:(m + 1) * sd].copy()
                      for m in range(m_subspaces)])
    src = emb.select(F.col(vec_col).alias(vec_col))
    for _ in range(max_iters):
        parts = src.mapInPandas(_pq_partials_gen(cents, vec_col),
                                _PQ_PARTIALS_SCHEMA).collect()
        cnt = np.zeros(cents.shape[:2], dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in sorted(parts, key=lambda r: (r["sub"], r["code"], r["pid"])):
            cnt[r["sub"], r["code"]] += r["n"]
            sums[r["sub"], r["code"]] += np.asarray(r["vsum"],
                                                    dtype=np.float64)
        new = cents.copy()
        live = cnt > 0
        new[live] = sums[live] / cnt[live][:, None]
        if np.array_equal(new, cents):
            break
        cents = new
    return PqCodebook(sub_centroids=cents)


def build_ivfpq_index(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      n_centroids: int | None = None,
                      m_subspaces: int = 8, n_codes: int = 16,
                      max_iters: int = 8) -> IvfPqIndex:
    """Coarse IVF centroids + PQ codebook, then ONE encode pass emitting
    (id, cluster, codes). Persist ``codes`` partitioned by ``cluster``: the
    probe filter prunes cells at the partition level AND each surviving row
    is M small ints, not 4·dim float bytes — the two compressions that make
    a 10^9-vector ANN scan feasible per query."""
    if n_centroids is None:
        n_centroids = pick_n_centroids(emb.count())
    coarse = train_kmeans(emb, n_centroids, id_col, vec_col, max_iters)
    book = train_pq(emb, m_subspaces, n_codes, id_col, vec_col, max_iters)
    cents = book.sub_centroids
    M, K, sd = cents.shape

    def encode_gen(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            mtx = _unit_rows(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
            cl = np.argmax(mtx @ coarse.T, axis=1).astype(np.int64)
            codes = np.empty((len(pdf), M), dtype=np.int32)
            for m in range(M):
                sub = mtx[:, m * sd:(m + 1) * sd]
                codes[:, m] = np.argmax(
                    sub @ cents[m].T - 0.5 * (cents[m] ** 2).sum(axis=1),
                    axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "cluster": cl,
                "codes": list(codes)})

    codes = emb.select(id_col, vec_col).mapInPandas(
        encode_gen, "id long, cluster long, codes array<int>")
    return IvfPqIndex(codes=codes, centroids=coarse, codebook=book)


def ivfpq_topk(index: IvfPqIndex, emb: DataFrame,
               query_vec: list[float], k: int = 10,
               nprobe: int | None = None, refine: int = 4,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ search: (1) score coarse centroids on the driver and probe the
    ``nprobe`` best cells; (2) ADC — ONE M × n_codes lookup table of
    ``dot(q_sub, codeword)`` built on the driver, so each candidate's
    approximate cosine is M table lookups + a sum (vectorized numpy fancy
    indexing inside mapInPandas — no float vectors touched); (3) the top
    ``k·refine`` ADC candidates re-score EXACTLY against the source table
    (broadcast semi-join on id — control-plane sized). Returns (id, cosine)
    ordered (cosine desc, id asc), exact cosines of approximate candidates —
    same contract as ivf_topk/ann_lsh_topk, oracle-checkable by recall."""
    n_centroids = index.centroids.shape[0]
    if nprobe is None:
        nprobe = pick_nprobe(n_centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    nq = np.linalg.norm(q)
    qd = q / nq if nq else q
    order = np.lexsort((np.arange(n_centroids), -(index.centroids @ qd)))
    probes = [int(c) for c in order[:nprobe]]
    cents = index.codebook.sub_centroids           # (M, K, sd)
    M, K, sd = cents.shape
    table = np.einsum("mkd,md->mk", cents, qd.reshape(M, sd))  # (M, K)

    def adc_gen(batches):
        import pandas as pd
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray([np.asarray(c) for c in pdf["codes"]],
                               dtype=np.int64)
            score = table[np.arange(M)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"].astype("int64"),
                                "adc": score})

    cand = (index.codes.filter(F.col("cluster").isin(probes))
            .mapInPandas(adc_gen, "id long, adc double")
            .orderBy(F.desc("adc"), F.asc("id"))
            .limit(max(k, k * refine))
            .select(F.col("id").alias("_cand_id")))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (emb.join(F.broadcast(cand), F.col(id_col) == F.col("_cand_id"))
            .select(F.col(id_col).alias("id"),
                    cosine_expr(F.col(vec_col), qcol).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def ivf_topk(index: IvfIndex, query_vec: list[float], k: int = 10,
             nprobe: int | None = None) -> DataFrame:
    """Approximate top-k by cosine: score centroids on the driver, scan only
    the ``nprobe`` nearest cells (partition-prunable ``isin`` filter), exact
    in-order fp64 cosine within them. (id, cosine) ordered (cosine desc,
    id asc) — same contract as similarity.cosine_topk / ann_lsh_topk."""
    n_centroids = index.centroids.shape[0]
    if nprobe is None:
        nprobe = pick_nprobe(n_centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    nq = np.linalg.norm(q)
    qd = q / nq if nq else q
    scores = index.centroids @ qd
    # deterministic probe order: score desc, cluster id asc
    order = np.lexsort((np.arange(n_centroids), -scores))
    probes = [int(c) for c in order[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (index.assignments.filter(F.col("cluster").isin(probes))
            .select("id", cosine_expr(F.col("vec"), qcol).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))

"""Text-analysis operators: language-ID, quality scoring, token counting,
winnowing document fingerprints.

Not in the reference (its only text analysis is the Lucene StandardAnalyzer
exercised at ``lucene/cLuceneIndexWriter.java:66``); these are the standard
training-data-pipeline document filters, built pure-Catalyst so each has an
exactly-reproducing DuckDB oracle. All token work uses the pinned *simple*
tokenizer (``ops.dedup.simple_tokens_col``); hashing via ``hashing.h60``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import simple_tokens_col

# ---------------------------------------------------------------------------
# language ID (marker-word heuristic)
# ---------------------------------------------------------------------------

# pinned marker vocabularies (tiny, deterministic; argmax of marker hits)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "es": ("el", "la", "los", "las", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "les", "et", "des", "une", "est", "pour", "dans", "qui"),
}
LANG_FALLBACK = "und"


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang): argmax of marker-word hit counts, ties broken by
    lang name asc, no hits → 'und'. One explode + one agg + one window."""
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(w, lang) for lang, ws in LANG_MARKERS.items() for w in ws],
        "tok string, lang string")
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(simple_tokens_col(text_col)).alias("tok"))
    hits = (toks.join(F.broadcast(markers), "tok")
            .groupBy("id", "lang").agg(F.count("*").alias("hits")))
    w = Window.partitionBy("id").orderBy(F.desc("hits"), F.asc("lang"))
    best = (hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).select("id", "lang"))
    return (df.select(F.col(id_col).alias("id"))
            .join(best, "id", "left")
            .select("id", F.coalesce("lang", F.lit(LANG_FALLBACK))
                    .alias("pred_lang")))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

QUALITY_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a", "that")


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features (all fp64, rounded to 6dp for cross-engine
    comparability): n_chars, n_tokens, avg_token_len, stopword_ratio,
    alnum_ratio, and a composite quality score in [0, 1]."""
    toks = simple_tokens_col(text_col)
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(toks).cast("double")
    tok_chars = F.aggregate(F.transform(toks, lambda x: F.length(x)),
                            F.lit(0), lambda a, x: a + x).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))
                    ).cast("double")
    avg_len = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    alnum_ratio = F.when(n_chars > 0, tok_chars / n_chars).otherwise(0.0)
    # composite: reward 3<=avg_len<=10, some stopwords, mostly-alnum text
    score = (F.least(F.lit(1.0), n_tokens / 20.0) * 0.25
             + F.when((avg_len >= 3.0) & (avg_len <= 10.0), 0.25)
                .otherwise(0.0)
             + F.when((stop_ratio > 0.0) & (stop_ratio < 0.6), 0.25)
                .otherwise(0.0)
             + alnum_ratio * 0.25)
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(score, 6).alias("quality"))


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

BPEISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, bpeish_tokens): whitespace split count + a BPE-ish
    regex count (letter runs / digit runs / single punctuation) over the
    lowercased text — the standard cheap proxy for LLM token budgeting."""
    t = F.lower(F.col(text_col))
    ws = F.size(F.split(F.trim(t), "\\s+"))
    ws = F.when(F.length(F.trim(t)) == 0, 0).otherwise(ws)
    bpeish = F.size(F.regexp_extract_all(t, F.lit(BPEISH_RE), 0))
    return df.select(F.col(id_col).alias("id"),
                     ws.cast("long").alias("ws_tokens"),
                     bpeish.cast("long").alias("bpeish_tokens"))


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document fingerprinting)
# ---------------------------------------------------------------------------

FP_K = 5   # char k-gram length
FP_W = 4   # winnowing window (k-grams per window)


def repetition_features(df: DataFrame, id_col: str, text_col: str
                        ) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals, per doc:

    - ``n_tokens``: simple-token count;
    - ``top_bigram_frac``: occurrences of the doc's most frequent word
      bigram / total bigrams (high = looping text);
    - ``dup_5gram_frac``: 1 − distinct/total word 5-grams (high =
      copy-paste repetition).

    Shapes: dup_5gram_frac is PURE in-row Catalyst (array_distinct on the
    shingle array — zero shuffle); top_bigram_frac is a two-level keyed
    aggregation ((id, gram) partial agg → per-id max/sum), scale-safe.
    Docs shorter than the gram width contribute one whole-string gram
    (fraction 0 — nothing repeats), mirrored by the oracle."""
    from .dedup import shingles_col
    toks = simple_tokens_col(text_col)
    g5 = shingles_col(text_col, 5)
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            (F.lit(1.0) - F.size(F.array_distinct(g5))
             / F.greatest(F.size(g5), F.lit(1))).cast("double"), 6)
        .alias("dup_5gram_frac"),
        shingles_col(text_col, 2).alias("_g2"))
    counts = (base.select("id", F.explode("_g2").alias("g"))
              .groupBy("id", "g").agg(F.count("*").alias("c"))
              .groupBy("id").agg(F.max("c").alias("top_c"),
                                 F.sum("c").alias("tot_c")))
    return (base.drop("_g2")
            .join(counts, "id", "left")
            .select("id", "n_tokens",
                    F.round(F.when(F.col("n_tokens") >= 2,
                                   F.col("top_c") / F.col("tot_c"))
                            .otherwise(0.0), 6)
                    .alias("top_bigram_frac"),
                    F.when(F.col("n_tokens") >= 5,
                           F.col("dup_5gram_frac"))
                    .otherwise(0.0).alias("dup_5gram_frac"))
            .orderBy("id"))


def fingerprints(df: DataFrame, id_col: str, text_col: str,
                 k: int = FP_K, w: int = FP_W) -> DataFrame:
    """(id, fp) distinct winnowing fingerprints: min h60 hash in every window
    of ``w`` consecutive char ``k``-grams of the lowercased text. Docs
    shorter than ``k`` chars hash their whole text once.

    Standard winnowing (Schleimer et al., SIGMOD'03) guarantees any shared
    substring of length >= w+k-1 yields a shared fingerprint — the basis for
    overlap detection between corpus shards.
    """
    # One mapInPandas pass over (id, lower(text)): grams, hashes, and the
    # sliding-min winnow all happen inside the UDF, per doc — NO corpus-wide
    # gram explode, no shuffle of gram hashes, and no row ever materializes
    # all of a document's (pos, hash) structs (a 10 MB doc's grams exist
    # only as a transient numpy array in its own task). md5 runs over the
    # UNIQUE grams of each doc (alphabet-bounded, ≪ gram count for natural
    # text), the same vocabulary-only discipline as hashing.h60_np; output
    # is flushed in bounded chunks so wide docs can't balloon one Arrow
    # batch. lower() stays in the JVM projection so unicode case folding
    # can never diverge from the F.lower-based oracle SQL.
    base = df.select(F.col(id_col).alias("id"),
                     F.lower(F.col(text_col)).alias("_t"))

    def gen(batches):
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        FLUSH = 1 << 18
        ids: list[int] = []
        fps: list[int] = []
        for pdf in batches:
            for i, s in zip(pdf["id"].to_numpy(), pdf["_t"].to_numpy()):
                if s is None or len(s) == 0:
                    continue
                if len(s) < k:
                    u = [int(_hl.md5(s.encode("utf-8"))
                             .hexdigest()[:15], 16)]
                else:
                    grams = [s[j:j + k] for j in range(len(s) - k + 1)]
                    uniq, inv = _np.unique(
                        _np.asarray(grams, dtype=object),
                        return_inverse=True)
                    hu = _np.empty(uniq.size, dtype=_np.int64)
                    for t, g in enumerate(uniq):
                        hu[t] = int(_hl.md5(g.encode("utf-8"))
                                    .hexdigest()[:15], 16)
                    a = hu[inv]
                    if a.size < w:
                        u = [int(a.min())]
                    else:
                        mins = _np.lib.stride_tricks.sliding_window_view(
                            a, w).min(axis=1)
                        u = _np.unique(mins).tolist()
                ids.extend([int(i)] * len(u))
                fps.extend(u)
                if len(ids) >= FLUSH:
                    yield _pd.DataFrame({"id": _pd.Series(ids, dtype="int64"),
                                         "fp": _pd.Series(fps, dtype="int64")})
                    ids, fps = [], []
        if ids:
            yield _pd.DataFrame({"id": _pd.Series(ids, dtype="int64"),
                                 "fp": _pd.Series(fps, dtype="int64")})

    # rows are distinct by construction (fps are np.unique'd per doc and
    # each doc is one input row) — no distinct() shuffle needed
    return base.mapInPandas(gen, "id long, fp long")


def fingerprint_summary(df: DataFrame, id_col: str, text_col: str,
                        k: int = FP_K, w: int = FP_W) -> DataFrame:
    """(id, n_fp, min_fp, max_fp, xor_fp) — order-insensitive per-doc digest
    of the fingerprint set (compact driver-oracle surface)."""
    fp = fingerprints(df, id_col, text_col, k, w)
    return (fp.groupBy("id")
            .agg(F.count("*").alias("n_fp"),
                 F.min("fp").alias("min_fp"),
                 F.max("fp").alias("max_fp"),
                 F.bit_xor("fp").alias("xor_fp")))


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# ---------------------------------------------------------------------------


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5, min_df: int = 1) -> DataFrame:
    """(id, term, tfidf, rank): the per-document top-``k`` terms by
    tf x ln(N/df) over the pinned simple tokenizer — the standard keyword /
    topic-signal extractor for training-data curation.

    Plan: one explode + (id, term) count (map-side partial agg), a
    vocabulary-sized df agg joined back on term, a single-row N broadcast
    cross join, and a per-document window (partitionBy id — never a global
    sort). Every stage is partition-parallel; the per-doc window holds at
    most that doc's distinct terms. Scores round to 6dp for cross-engine
    comparability; ties break term asc (deterministic)."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(simple_tokens_col(text_col)).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = (tf.groupBy("term").agg(F.count("*").alias("df"))
             .filter(F.col("df") >= min_df))
    n = df.select(F.count("*").cast("double").alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)))
    w = Window.partitionBy("id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "term", "tfidf",
                    F.col("rank").cast("long").alias("rank")))


# ---------------------------------------------------------------------------
# bigram collocations (PMI)
# ---------------------------------------------------------------------------


def collocations(df: DataFrame, id_col: str, text_col: str,
                 min_count: int = 3, k: int = 20) -> DataFrame:
    """(bigram, n_pair, pmi): the corpus's top-``k`` adjacent-token
    collocations by pointwise mutual information, ln(c_xy * T / (c_x *
    c_y)) with T = total bigram count, restricted to pairs seen at least
    ``min_count`` times — the classic phrase-mining signal (Church & Hanks
    1990). Pure Catalyst: bigrams come from zip_with(tokens, shifted
    tokens) inside the row (no positional self-join), then two corpus aggs
    (pair + unigram counts) and one broadcast of the scalar totals. Ties
    break bigram asc; pmi rounds to 6dp."""
    ts = simple_tokens_col(text_col)
    pairs = F.zip_with(ts, F.slice(ts, 2, F.greatest(F.size(ts) - 1,
                                                     F.lit(0))),
                       lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with null and concat_ws drops nulls,
    # so the trailing element is a lone token — keep real pairs only
    pairs = F.filter(pairs, lambda p: p.contains(" "))
    big = df.select(F.explode(pairs).alias("bigram"))
    pair_cnt = big.groupBy("bigram").agg(F.count("*").alias("n_pair"))
    uni = (df.select(F.explode(ts).alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("n_tok")))
    tot = pair_cnt.agg(F.sum("n_pair").cast("double").alias("t_pairs"))
    lhs = F.split(F.col("bigram"), " ").getItem(0)
    rhs = F.split(F.col("bigram"), " ").getItem(1)
    scored = (pair_cnt.filter(F.col("n_pair") >= min_count)
              .withColumn("_x", lhs).withColumn("_y", rhs)
              .join(uni.withColumnRenamed("tok", "_x")
                    .withColumnRenamed("n_tok", "c_x"), "_x")
              .join(uni.withColumnRenamed("tok", "_y")
                    .withColumnRenamed("n_tok", "c_y"), "_y")
              .crossJoin(F.broadcast(tot))
              .withColumn("pmi", F.round(F.log(
                  F.col("n_pair") * F.col("t_pairs")
                  / (F.col("c_x") * F.col("c_y"))), 6)))
    return (scored.select("bigram", "n_pair", "pmi")
            .orderBy(F.desc("pmi"), F.asc("bigram")).limit(k))


# ---------------------------------------------------------------------------
# cross-document shared spans (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def shared_span_pairs(df: DataFrame, id_col: str, text_col: str,
                      k: int = FP_K, w: int = FP_W,
                      min_common: int = 2,
                      max_bucket: int | None = None) -> DataFrame:
    """(id_a, id_b, n_common): document pairs sharing >= ``min_common``
    winnowing fingerprints — the cross-document exact-substring overlap
    signal of training-data dedup pipelines (any shared substring of length
    >= w+k-1 chars is guaranteed a shared fingerprint, Schleimer et al.
    SIGMOD'03), complementary to the token-set MinHash path: it catches a
    copied paragraph inside otherwise-different documents, which Jaccard
    over whole-document shingle sets dilutes away.

    Plan: the per-doc fingerprint pass (``fingerprints`` — one mapInPandas,
    no gram shuffle) feeds ONE self-join keyed on fp. At scale every hot
    fingerprint (license boilerplate, generated headers) is a degenerate
    bucket, so oversized buckets emit O(N) star pairs (every member against
    the bucket's min id) instead of O(N²) — same guard as
    ``dedup.capped_bucket_pairs`` but WITH per-fp multiplicity kept (its
    trailing distinct() would collapse ``n_common`` to 1): each fp a pair
    co-occurs under contributes one row, so the count is the number of
    shared fingerprints (capped buckets: of star pairs). Pass
    ``max_bucket=None`` for the exact uncapped join on bounded inputs —
    the oracle-checkable mode. Output ordered (n_common desc, id_a, id_b).
    """
    fp = fingerprints(df, id_col, text_col, k, w)
    if max_bucket is None:
        small = fp
        star = None
    else:
        # bucket-count window shuffles on fp, same key as the join below
        wfp = Window.partitionBy("fp")
        b = (fp.withColumn("_cnt", F.count("*").over(wfp))
               .withColumn("_rep", F.min("id").over(wfp)))
        small = b.filter(F.col("_cnt") <= max_bucket).select("id", "fp")
        star = (b.filter((F.col("_cnt") > max_bucket)
                         & (F.col("id") > F.col("_rep")))
                .select(F.col("_rep").alias("id_a"),
                        F.col("id").alias("id_b")))
    a, c = small.alias("a"), small.alias("b")
    pairs = (a.join(c, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b")))
    if star is not None:
        pairs = pairs.unionByName(star)
    return (pairs.groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
            .filter(F.col("n_common") >= min_common)
            .orderBy(F.desc("n_common"), F.asc("id_a"), F.asc("id_b")))


# ---------------------------------------------------------------------------
# PII redaction (round 4, final)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark, whole-stage codegen) and RE2 (DuckDB oracle): character
# classes, bounded repetition, \b — no lookaround, no backreferences.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_HEX = r"\b[0-9a-fA-F]{32,}\b"
_PII_RULES = ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
              (PII_HEX, "<HEX>"))


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scrub the standard PII classes a pretraining pipeline drops
    before export: emails, IPv4 addresses, and long hex blobs (API
    keys / hashes, >= 32 hex chars) each replaced by a typed
    placeholder, applied in that order. Per-class match counts are
    taken from the ORIGINAL text (diagnostics for filtering/reporting).

    Pure JVM ``regexp_replace``/``regexp_extract_all`` expressions —
    no UDF in the path, scales as a map-side projection; the exact
    same pattern strings run under DuckDB for the oracle. Returns
    (id, n_emails, n_ips, n_hex, clean_text)."""
    t = F.col(text_col)
    clean = t
    for pat, tag in _PII_RULES:
        clean = F.regexp_replace(clean, pat, tag)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0))
        .cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_HEX), 0))
        .cast("long").alias("n_hex"),
        clean.alias("clean_text"))

"""Deterministic corpus splitting and token-budget sharding — the two
assignment ops a training-data pipeline runs right before export.

Reference scope note: the reference app has no train/eval notion (it is
an indexer/search UI); these belong to the task brief's "operations a
large-scale training-data pipeline would need", next to the dedup /
quality ops.

Design for 100 TB:

- ``hash_split`` is a pure per-row expression (sha2 → hex-prefix
  compare). No shuffle, no RNG state, no driver participation; the
  assignment is a FUNCTION of the key, so it is stable across reruns,
  cluster sizes, partitionings, and engine versions — re-ingesting a doc
  lands it in the same split (the property ``df.sample``/Bernoulli RNG
  sampling does NOT give you), and a join against any other table keyed
  the same way preserves the split.
- ``token_budget_bins`` needs a GLOBAL prefix sum over a deterministic
  order. The classic two-pass scan: per-partition partial sums (one
  tiny agg), driver-side exclusive offsets over n_partitions rows
  (control-plane), broadcast back, per-partition cumsum adds its
  offset. The only full-data shuffle is the range partitioning that
  establishes the order — nothing driver-side ever sees a data row.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HEX_DIGITS = 8             # sha2 prefix compared: 16^8 ≈ 4.3e9 buckets


def _hex_threshold(frac: float) -> str:
    """Zero-padded lowercase hex threshold for ``h < threshold`` to keep
    ~``frac`` of uniformly-hashed keys; frac >= 1 returns a sentinel
    above every hex string (``'g' > 'f'`` lexicographically), so
    rate-1.0 keeps rows whose prefix is ``ffffffff`` too."""
    if frac <= 0:
        return "0" * _HEX_DIGITS
    n = int(frac * 16 ** _HEX_DIGITS)
    if n >= 16 ** _HEX_DIGITS:
        return "g" * _HEX_DIGITS
    return format(n, f"0{_HEX_DIGITS}x")


def split_thresholds(fractions: "dict[str, float]") -> "list[tuple[str, str]]":
    """(name, inclusive-upper hex threshold) per split, in declaration
    order; the last split absorbs rounding remainder. Shared by the
    Spark expression and the DuckDB oracle so both compare the SAME
    zero-padded lowercase hex strings."""
    if not fractions:
        raise ValueError("need at least one split fraction")
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        out.append((name, _hex_threshold(acc)))
    out.append((names[-1], "g" * _HEX_DIGITS))  # 'g' > every hex digit
    return out


def hash_split(df: DataFrame, key_col: str,
               fractions: "dict[str, float]",
               salt: str = "split-v1",
               out_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label (train/val/test …)
    by hashing ``salt || key``: bucket = the first 8 hex chars of
    sha256, compared lexicographically against cumulative-fraction
    thresholds. Pure map-side expression — see module docstring for why
    this beats RNG sampling at scale. ``salt`` versions the assignment:
    changing it re-deals every row independently."""
    h = F.substring(
        F.sha2(F.concat(F.lit(salt + ":"),
                        F.col(key_col).cast("string")), 256),
        1, _HEX_DIGITS)
    expr = None
    for name, thresh in reversed(split_thresholds(fractions)):
        expr = (F.lit(name) if expr is None
                else F.when(h < F.lit(thresh), F.lit(name))
                .otherwise(expr))
    return df.withColumn(out_col, expr)


def hash_split_sql(table: str, key_col: str,
                   fractions: "dict[str, float]",
                   salt: str = "split-v1") -> str:
    """DuckDB twin of ``hash_split``'s assignment expression (both
    engines emit lowercase hex sha256, so the lexicographic compare is
    identical); returns the CASE expression selecting the split name."""
    ths = split_thresholds(fractions)
    h = (f"substr(sha256('{salt}:' || {key_col}::VARCHAR), "
         f"1, {_HEX_DIGITS})")
    clauses = " ".join(
        f"WHEN {h} < '{t}' THEN '{n}'" for n, t in ths[:-1])
    return f"CASE {clauses} ELSE '{ths[-1][0]}' END"


def hash_sample(df: DataFrame, key_col: str,
                rate: "float | dict[str, float]",
                by_col: str | None = None,
                default_rate: float = 1.0,
                salt: str = "sample-v1") -> DataFrame:
    """Deterministic downsampling / mixture construction without RNG:
    keep a row iff its sha256 hex prefix (over ``salt || key``) falls
    below the rate's threshold. A scalar ``rate`` thins uniformly; a
    dict keyed by ``by_col`` values keeps each category at its own rate
    (the training-mix op: e.g. keep 100% of a rare domain, 10% of
    boilerplate), unmapped categories at ``default_rate``. Same
    stability story as ``hash_split``: pure map-side expression, the
    keep decision is a function of the key — reruns, repartitions, and
    joins all agree, and a different ``salt`` draws an independent
    sample (also independent of ``hash_split``'s deal)."""
    h = F.substring(
        F.sha2(F.concat(F.lit(salt + ":"),
                        F.col(key_col).cast("string")), 256),
        1, _HEX_DIGITS)
    if isinstance(rate, dict):
        if by_col is None:
            raise ValueError("a rate dict needs by_col")
        thresh = F.lit(_hex_threshold(default_rate))
        for val, r in rate.items():
            thresh = F.when(F.col(by_col) == val,
                            F.lit(_hex_threshold(r))).otherwise(thresh)
    else:
        thresh = F.lit(_hex_threshold(float(rate)))
    return df.filter(h < thresh)


def hash_sample_sql(key_col: str, rate: "float | dict[str, float]",
                    by_col: str | None = None,
                    default_rate: float = 1.0,
                    salt: str = "sample-v1") -> str:
    """DuckDB twin of ``hash_sample``'s keep predicate (a WHERE
    condition string)."""
    h = (f"substr(sha256('{salt}:' || {key_col}::VARCHAR), "
         f"1, {_HEX_DIGITS})")
    if isinstance(rate, dict):
        clauses = " ".join(
            f"WHEN {by_col} = '{v}' THEN '{_hex_threshold(r)}'"
            for v, r in rate.items())
        thresh = (f"(CASE {clauses} ELSE "
                  f"'{_hex_threshold(default_rate)}' END)")
    else:
        thresh = f"'{_hex_threshold(float(rate))}'"
    return f"{h} < {thresh}"


def token_budget_bins(spark: SparkSession, df: DataFrame,
                      id_col: str, tokens_col: str,
                      budget: int, partitions: int = 32) -> DataFrame:
    """Shard a corpus into contiguous ~``budget``-token bins in
    ``id_col`` order: ``bin_id = floor(exclusive_prefix_sum / budget)``
    — the deterministic offset-binning used to cut a corpus into
    fixed-token-budget shards/epochs. (This is offset binning, NOT
    greedy bin packing: a doc may straddle a budget boundary — the
    greedy reset recursion is inherently sequential and is deliberately
    not offered as a distributed op.)

    Distributed shape (exact global prefix sum, two passes): range-
    partition by ``id_col``; pass 1 aggregates one (partition, sum) row
    per partition (control-plane); the driver computes exclusive
    partition offsets; pass 2 adds ``offset[pid] + local exclusive
    cumsum`` map-side. Returns (id, tokens, bin_id)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    import pandas as pd

    # persist pins the range partitioning so the pid → offset map from
    # pass 1 is valid in pass 2 (two separate jobs would otherwise be
    # free to re-derive boundaries); both passes read the cached blocks
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(tokens_col).cast("long").alias("tokens"))
            .repartitionByRange(partitions, "id")
            .sortWithinPartitions("id")
            .withColumn("pid", F.spark_partition_id())
            .persist())
    part_sums = (base.groupBy("pid")
                 .agg(F.sum("tokens").alias("s"),
                      F.min("id").alias("lo"))
                 .collect())                  # n_partitions rows
    offsets, acc = {}, 0
    for r in sorted(part_sums, key=lambda r: r["lo"]):
        offsets[int(r["pid"])] = acc
        acc += int(r["s"])
    b_off = spark.sparkContext.broadcast(offsets)
    budget_l = int(budget)

    def add_bins(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("id")
            off = b_off.value.get(int(pdf["pid"].iloc[0]), 0)
            excl = pdf["tokens"].cumsum() - pdf["tokens"] + off
            yield pd.DataFrame({
                "id": pdf["id"], "tokens": pdf["tokens"],
                "bin_id": (excl // budget_l).astype("int64")})

    return base.mapInPandas(add_bins,
                            "id long, tokens long, bin_id long")

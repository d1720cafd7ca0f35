"""Cross-engine deterministic hashing primitives.

Everything downstream (MinHash, SimHash, LSH bands, winnowing fingerprints)
hashes through ``h60``: the first 15 hex chars of md5, parsed as a base-16
int64 (60 bits, always non-negative, fits BIGINT in both Spark and DuckDB).

Verified identities:
  Spark : F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast('long')
  DuckDB: ('0x' || substr(md5(c), 1, 15))::BIGINT
  Python: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

MinHash permutations are classic universal hashes (a_i*x + b_i) mod P with
pinned small coefficients; x is first reduced mod P (P < 2^30) so every
product fits comfortably in int64 — no overflow in either engine (Spark 4
runs ANSI mode where silent wraparound would instead throw).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# largest prime < 2^30; keeps a*x+b within int64 for a < 2^20
MINHASH_P = 1073741789
NUM_PERM = 32
LSH_BANDS = 8          # 8 bands x 4 rows over the 32-perm signature
LSH_ROWS = NUM_PERM // LSH_BANDS


def perm_coeffs(i: int) -> tuple[int, int]:
    """Pinned permutation coefficients (documented in oracle SQL too)."""
    return 2 * i + 3, 5 * i + 7


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60_np(strings: np.ndarray) -> np.ndarray:
    """Vectorized-ish h60 over an object array of strings. md5 has no numpy
    kernel, so this loops — call it only over UNIQUE terms per Arrow batch
    (vocabulary-sized, not corpus-sized)."""
    out = np.empty(strings.size, dtype=np.int64)
    for j, s in enumerate(strings):
        out[j] = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    return out


def h60_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_np(term_hashes: np.ndarray, n_perm: int = NUM_PERM) -> np.ndarray:
    """Signature (n_perm,) over a set of h60 term hashes (numpy int64)."""
    x = (term_hashes % MINHASH_P).astype(np.int64)
    a = np.array([perm_coeffs(i)[0] for i in range(n_perm)], dtype=np.int64)
    b = np.array([perm_coeffs(i)[1] for i in range(n_perm)], dtype=np.int64)
    # (n_perm, n_terms) fits: small vocab per doc
    hv = (a[:, None] * x[None, :] + b[:, None]) % MINHASH_P
    return hv.min(axis=1)

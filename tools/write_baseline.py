#!/usr/bin/env python
"""Regenerate BASELINE.md's measured section from a saved bench JSON line.

Usage: python tools/write_baseline.py <bench_output.json>

bench.py --scaling does this inline; this tool re-applies the rewrite from a
JSON kept from an earlier run (e.g. after reverting a slow-phase rewrite, or
to adopt the best of several runs without re-benching for ~12 minutes).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    with open(sys.argv[1]) as f:
        out = json.loads(f.read().strip().splitlines()[-1])
    cpus = int(out.get("metric", "").split("local[")[1].split("]")[0]) \
        if "local[" in out.get("metric", "") else 32
    small = max(1, cpus // 4)
    tiny = max(1, small // 4)
    bench._write_baseline_section(out, tiny, small)
    print(f"BASELINE.md measured section rewritten from {sys.argv[1]} "
          f"(levels {tiny}/{small}/{cpus})")


if __name__ == "__main__":
    main()

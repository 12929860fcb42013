#!/usr/bin/env python3
"""Emit the SCALE.md scaling table from three single-SF bench artifacts.

Usage:
  python3 tools/scaling_table.py sf0001.json sf001.json sf01.json q01 q14 ...

Each artifact comes from a `SPARK_GRAFT_ONLY=<qids> SPARK_GRAFT_SF_DIR=...
SPARK_GRAFT_BENCH_OUT=...` bench run of the same build at one scale factor.
Prints a markdown table of per-query wall time at each SF and the
10×-data time ratios (sub-10× = sub-linear in wall-clock at fixed
parallelism). Dev-only tooling; the engine is pure Scala/Spark.
"""
import sys, json

def main():
    arts = [json.load(open(p))["queries"] for p in sys.argv[1:4]]
    qids = sys.argv[4:]
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.001→0.01 | 0.01→0.1 |")
    print("|---|---|---|---|---|---|")
    for q in qids:
        t = [a.get(q) for a in arts]
        if any(v is None or v <= 0 for v in t):
            print(f"| {q} | — | — | — | — | — |")
            continue
        print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} "
              f"| {t[1] / t[0]:.1f}× | {t[2] / t[1]:.1f}× |")

if __name__ == "__main__":
    main()

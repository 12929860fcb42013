#!/usr/bin/env python3
"""Emit the SCALE.md isolated-vs-in-suite table for the top-N expensive
queries of a bench artifact.

Usage:
  python3 tools/bench_hygiene.py bench_latest.json isolated.json [N]

`bench_latest.json` is the full-suite artifact Bench writes; the isolated
file comes from a `SPARK_GRAFT_ONLY=<top-N qids> SPARK_GRAFT_BENCH_OUT=...`
rerun of the same build. Dev-only tooling (the engine is pure Scala/Spark);
prints a markdown table on stdout for pasting into SCALE.md.
"""
import sys, json

def main():
    suite = json.load(open(sys.argv[1]))["queries"]
    iso = json.load(open(sys.argv[2]))["queries"]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    top = sorted(((k, v) for k, v in suite.items() if v >= 0),
                 key=lambda kv: -kv[1])[:n]
    print("| query | in-suite s | isolated s | ratio |")
    print("|---|---|---|---|")
    for k, v in top:
        i = iso.get(k)
        if i is None or i <= 0:
            print(f"| {k} | {v:.2f} | — | — |")
        else:
            print(f"| {k} | {v:.2f} | {i:.2f} | {v / i:.2f}× |")

if __name__ == "__main__":
    main()

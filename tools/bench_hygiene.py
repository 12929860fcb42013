#!/usr/bin/env python3
"""Bench hygiene tooling (dev-only; the engine is pure Scala/Spark).

Two modes:

1. Isolated-vs-in-suite table for SCALE.md (top-N expensive queries):

     python3 tools/bench_hygiene.py bench_latest.json isolated.json [N]

   `bench_latest.json` is the full-suite artifact Bench writes; the
   isolated file comes from a `SPARK_GRAFT_ONLY=<qids>
   SPARK_GRAFT_BENCH_OUT=...` rerun of the same build. Prints a
   markdown table on stdout for pasting into SCALE.md. Queries listed
   in the isolated file but absent from the top-N (e.g. delta-flagged
   ones) are appended below the top-N rows.

2. Round-over-round delta flagging (the round-7 lesson: in-suite
   regressions past the documented ±20-40% noise band — q127 0.9→4.0 s,
   q95 1.2→3.9 s — must be isolated-rerun before they are believed):

     python3 tools/bench_hygiene.py --deltas prev_bench.json curr_bench.json [ratio]

   Flags queries positive in both artifacts whose time moved by more
   than `ratio` (default 2.0) in either direction, and prints the
   ready-to-paste `SPARK_GRAFT_ONLY=...` rerun line. Exit code 1 when
   anything is flagged, so a round script can gate on it.
"""
import sys, json


def load_queries(path):
    return json.load(open(path))["queries"]


def table_mode(argv):
    suite = load_queries(argv[0])
    iso = load_queries(argv[1])
    n = int(argv[2]) if len(argv) > 2 else 5
    top = sorted(((k, v) for k, v in suite.items() if v >= 0),
                 key=lambda kv: -kv[1])[:n]
    top_keys = {k for k, _ in top}
    extra = [(k, suite.get(k, -1)) for k in iso
             if k not in top_keys and iso[k] > 0 and suite.get(k, -1) >= 0]
    print("| query | in-suite s | isolated s | ratio |")
    print("|---|---|---|---|")
    for k, v in top + sorted(extra, key=lambda kv: -kv[1]):
        i = iso.get(k)
        if i is None or i <= 0:
            print(f"| {k} | {v:.2f} | — | — |")
        else:
            print(f"| {k} | {v:.2f} | {i:.2f} | {v / i:.2f}× |")


def deltas_mode(argv):
    prev = load_queries(argv[0])
    curr = load_queries(argv[1])
    thresh = float(argv[2]) if len(argv) > 2 else 2.0
    flagged = []
    for k, c in curr.items():
        p = prev.get(k)
        if p is None or p <= 0 or c <= 0:
            continue
        ratio = c / p
        if ratio > thresh or ratio < 1.0 / thresh:
            flagged.append((k, p, c, ratio))
    flagged.sort(key=lambda r: -max(r[3], 1 / r[3]))
    if not flagged:
        print(f"no round-over-round deltas beyond {thresh}x")
        return 0
    print(f"| query | prev s | curr s | ratio | direction |")
    print(f"|---|---|---|---|---|")
    for k, p, c, r in flagged:
        d = "REGRESSED" if r > 1 else "improved"
        print(f"| {k} | {p:.2f} | {c:.2f} | {r:.2f}× | {d} |")
    only = ",".join(k for k, _, _, _ in flagged)
    print(f"\nisolated rerun: SPARK_GRAFT_ONLY={only} "
          f"SPARK_GRAFT_BENCH_OUT=/tmp/iso.json "
          f"SPARK_GRAFT_SF_DIR=<sf> sbt 'runMain graft.Bench'")
    return 1


def main():
    if sys.argv[1] == "--deltas":
        sys.exit(deltas_mode(sys.argv[2:]))
    table_mode(sys.argv[1:])


if __name__ == "__main__":
    main()

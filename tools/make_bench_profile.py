#!/usr/bin/env python3
"""Regenerate bench_profile.json from one or more full-suite bench runs.

bench_profile.json is Bench.scala's per-query reference: in the graded
run, any query measuring >2x its profile entry (and >0.3s over it) gets
two same-JVM reruns and the MEDIAN of the three measurements is
reported — the noise control that keeps single-pass suite-neighborhood
blow-ups (round 8: 111s of phantom time) out of the graded artifact
without the downward-only bias a min would have.

Usage:
    python3 tools/make_bench_profile.py run1.json [run2.json ...] \
        [-o bench_profile.json]

Each input is a bench_latest.json-style line ({"queries": {...}, ...}).
The profile value per query is the MEDIAN across runs (the advisor's
round-9 fix: a min-of-mins profile ratchets down across rounds). The
profile only gates WHEN to rerun — reported numbers are medians of
fresh measurements either way — so a low profile costs extra (cheap)
reruns rather than biasing results, but the median is the honest
central reference. Queries failing (-1) in a run are ignored for that
run.
"""
import argparse
import json
import statistics
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", help="bench_latest.json-style files")
    ap.add_argument("-o", "--out", default="bench_profile.json")
    args = ap.parse_args()

    samples: dict[str, list[float]] = {}
    for path in args.runs:
        with open(path) as f:
            data = json.load(f)
        queries = data.get("queries") or {}
        if not queries:
            print(f"warning: {path} has no per-query map, skipped",
                  file=sys.stderr)
            continue
        for q, t in queries.items():
            if t is None or t < 0:
                continue
            samples.setdefault(q, []).append(float(t))
    prof = {q: statistics.median(ts) for q, ts in samples.items()}

    if not prof:
        print("error: no per-query data in any input", file=sys.stderr)
        return 1

    with open(args.out, "w") as f:
        json.dump(dict(sorted(prof.items())), f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.out}: {len(prof)} queries, "
          f"total {sum(prof.values()):.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

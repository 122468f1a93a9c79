#!/usr/bin/env python3
"""Least-squares scaling-exponent fits (wall ∝ n^α) over bench snapshots.

Usage: alpha_fit.py 1:bench-sf01.json 10:bench-sf1.json 30:bench-sf3.json 100:bench-sf10.json
Each arg is <scale>:<file>. Queries present in ≥2 points get a fit; the
solo map (when a file carries one) overrides the in-suite reading — scale
claims must not rest on contention artifacts (see BASELINE.md protocol).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        b = json.load(f)
    q = {k: float(v) for k, v in b["queries"].items()}
    for k, v in b.get("solo", {}).items():
        q[k] = min(q.get(k, float(v)), float(v))
    return q


def main():
    points = []
    for arg in sys.argv[1:]:
        scale, path = arg.split(":", 1)
        points.append((float(scale), load(path)))
    points.sort()
    names = sorted(set().union(*[set(q) for _, q in points]))
    print(f"{'query':34s} " +
          " ".join(f"{int(s)}x".rjust(8) for s, _ in points) + "   alpha  pts")
    for n in names:
        xs, ys, cells = [], [], []
        for s, q in points:
            if n in q and q[n] > 0:
                xs.append(math.log(s))
                ys.append(math.log(q[n]))
                cells.append(f"{q[n]:8.2f}")
            else:
                cells.append("       -")
        if len(xs) < 2:
            continue
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        print(f"{n:34s} " + " ".join(cells) + f"  {alpha:6.2f}  {len(xs)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query bench regression gate (VERDICT r9 item 7).

Runs the full Bench suite at the given SF, diffs per-query seconds against
the last committed snapshot, and SOLO-CONFIRMS movers before failing: any
shared query whose in-suite time grew more than RATIO x (and by more than
ABS_FLOOR seconds — tiny queries jitter) is re-run in a subset Bench
invocation (time-decorrelated, effectively solo); only movers that are
STILL >RATIO x solo fail the gate. This encodes the judge's r8/r9 diff
protocol: in-suite readings on a shared box fold in ambient contention,
so a regression call must survive a solo A/B first.

Usage: bench_regress.py --baseline bench-sf01-rX.json
                        [--sf /root/testdata/sf0.1] [--out /tmp/dir]
                        [--new /path/bench.json   # skip the run, use file]
Exit codes: 0 = no solo-confirmed regressions, 1 = regression, 2 = usage.
"""
import argparse
import json
import os
import subprocess
import sys
import glob

RATIO = 1.5
ABS_FLOOR = 0.3   # seconds of growth; below this, ratio flags are noise
LOAD_GUARD = 4.0  # ambient 1-min loadavg above this at bench START means
                  # the box was already contended before we ran a query
MIN_SOLO = 1.0    # a solo-confirmed time must exceed this to matter: the
                  # in-suite baseline amortizes FS caches/session overheads a
                  # solo re-run pays cold, so sub-second queries read 2-4x
                  # their in-suite number solo without any code change
                  # (measured: t21 0.15s in-suite, 0.39s solo, same build)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measurement-ordering comparability (r14 postmortem, pinned r15): in-suite
# per-query readings depend on wall-clock POSITION in the suite (JIT warm-up
# maturity — the same 60 queries read 1.44x slower median as their own suite
# than inside the 208-query suite). Bench has measured in SORTED name order
# since r14 and stamps snapshots with "order":"sorted"; pre-r14 snapshots
# were Map-hash order, which reshuffles globally on suite growth — comparing
# across the ordering break manufactures exactly the "uniform +10% drift"
# r13 burned a round diagnosing. r14's snapshots predate the stamp but were
# measured sorted; they are grandfathered by basename.
KNOWN_SORTED_BASENAMES = {"bench-sf01-r14.json", "bench-sf10-r14.json"}


def snapshot_order(data, path):
    o = data.get("order")
    if o:
        return o
    if os.path.basename(path) in KNOWN_SORTED_BASENAMES:
        return "sorted"
    return "unknown"


def classpath():
    jars = ":".join(sorted(glob.glob("/opt/spark/jars/*.jar")))
    return f"{REPO}/target/scala-2.13/classes:{jars}"


def add_opens():
    out = []
    with open(os.path.join(REPO, "build.sbt")) as f:
        for line in f:
            line = line.strip()
            if line.startswith('"--add-opens='):
                out.append(line.strip('",'))
    return out


def run_bench(sf_dir, out_file, queries=None, reps=2):
    cmd = (["java", "-XX:ReservedCodeCacheSize=1g"] + add_opens() +
           ["-cp", classpath(), "-Xmx24g", "graft.Bench"] + (queries or []))
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_OUT=out_file,
               SPARK_GRAFT_BENCH_REPS=str(reps))
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
        raise SystemExit(f"bench run failed (exit {r.returncode})")
    with open(out_file) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp")
    ap.add_argument("--new", default=None,
                    help="existing bench json to gate instead of running")
    ap.add_argument("--assume-same-ordering", action="store_true",
                    help="override the measurement-ordering guard (only if "
                         "you KNOW both snapshots were measured in the same "
                         "query order)")
    args = ap.parse_args()

    with open(args.baseline) as f:
        base = json.load(f)
    base_q = {k: float(v) for k, v in base["queries"].items()}

    base_order = snapshot_order(base, args.baseline)
    if base_order != "sorted" and not args.assume_same_ordering:
        sys.stderr.write(
            f"bench_regress: REFUSING baseline {args.baseline}: measurement "
            f"ordering is '{base_order}', not 'sorted'. Per-query in-suite "
            "times are position-dependent (JIT warm-up); comparing across "
            "an ordering change reads as uniform drift (the r13 incident). "
            "Re-base on an r14+ snapshot, or pass --assume-same-ordering if "
            "both snapshots provably share an ordering.\n")
        return 2

    if args.new:
        with open(args.new) as f:
            fresh = json.load(f)
        fresh_order = snapshot_order(fresh, args.new)
        if fresh_order != base_order and not args.assume_same_ordering:
            sys.stderr.write(
                f"bench_regress: REFUSING --new {args.new}: its ordering "
                f"'{fresh_order}' differs from the baseline's "
                f"'{base_order}' — cross-ordering per-query diffs are "
                "meaningless (see ordering note at top of this tool).\n")
            return 2
    else:
        fresh = run_bench(args.sf, os.path.join(args.out, "bench-gate.json"))
    fresh_q = {k: float(v) for k, v in fresh["queries"].items()}
    solo_map = {k: float(v) for k, v in fresh.get("solo", {}).items()}

    # Load guard (VERDICT r10 task 2): Bench now records ambient 1-min
    # loadavg (sampled before the Spark session existed) and PSI io avg10
    # in the metric line. High ambient start-load means the totals are
    # upper bounds measured under contention — say so up front instead of
    # requiring a manual adjudication against builder snapshots.
    load = fresh.get("load") or {}
    if load:
        ls, le = float(load.get("start", -1)), float(load.get("end", -1))
        print(f"bench_regress: load start={ls:.2f} end={le:.2f} "
              f"io_start={float(load.get('io_start', -1)):.2f} "
              f"io_end={float(load.get('io_end', -1)):.2f}")
        if ls > LOAD_GUARD:
            print(f"bench_regress: WARNING — ambient start load {ls:.2f} > "
                  f"{LOAD_GUARD}: run measured under external contention; "
                  "totals are upper bounds (drift normalizer + in-run solo "
                  "map adjudicate per-query calls below)")

    shared = sorted(set(base_q) & set(fresh_q))
    print(f"bench_regress: {len(shared)} shared queries "
          f"(baseline {len(base_q)}, fresh {len(fresh_q)})")

    # Whole-box drift normalizer: when the BOX is uniformly slower than it
    # was at snapshot time, every query's ratio inflates together and the
    # solo re-run CONFIRMS the drift instead of refuting it (measured
    # 2026-08-15: untouched reference queries read 1.2-1.9x their morning
    # baselines in the same afternoon run; a provably code-identical query
    # was "solo-confirmed" at 1.64x). The median per-query ratio over ALL
    # shared queries estimates the drift; a genuine single-query regression
    # cannot move the median of ~180 rows. Suspects are judged on their
    # drift-NORMALIZED ratio.
    ratios = sorted(fresh_q[q] / base_q[q] for q in shared if base_q[q] > 0)
    drift = ratios[len(ratios) // 2] if ratios else 1.0
    drift = max(drift, 1.0)  # a faster box never excuses a slow query
    if drift > 1.1:
        print(f"bench_regress: box drift detected — median shared-query "
              f"ratio {drift:.2f}x; thresholds scaled accordingly")

    suspects = []
    for q in shared:
        old, new = base_q[q] * drift, fresh_q[q]
        if new > old * RATIO and new - old > ABS_FLOOR:
            # the in-run solo map may already refute it
            solo = solo_map.get(q)
            if solo is not None and not (solo > old * RATIO and
                                         solo - old > ABS_FLOOR and
                                         solo > MIN_SOLO):
                print(f"  refuted by in-run solo: {q} "
                      f"in-suite {new:.2f}s solo {solo:.2f}s vs base {old:.2f}s")
            else:
                suspects.append((q, old, new))

    if not suspects:
        print("bench_regress: no suspects above "
              f"{RATIO}x + {ABS_FLOOR}s — gate green")
        return 0

    print(f"bench_regress: {len(suspects)} suspect(s), solo re-running: "
          + ", ".join(q for q, _, _ in suspects))
    solo_out = os.path.join(args.out, "bench-gate-solo.json")
    solo = run_bench(args.sf, solo_out,
                     queries=[q for q, _, _ in suspects], reps=3)
    solo_q = {k: float(v) for k, v in solo["queries"].items()}

    failures = []
    for q, old, new in suspects:
        s = solo_q.get(q, new)
        if s > old * RATIO and s - old > ABS_FLOOR and s > MIN_SOLO:
            failures.append((q, old, new, s))
            print(f"  REGRESSION {q}: base {old:.2f}s -> in-suite {new:.2f}s, "
                  f"solo-CONFIRMED {s:.2f}s ({s / old:.2f}x)")
        else:
            print(f"  refuted solo: {q} in-suite {new:.2f}s but solo {s:.2f}s "
                  f"vs base {old:.2f}s (contention artifact)")

    if failures:
        print(f"bench_regress: {len(failures)} solo-confirmed regression(s)")
        return 1
    print("bench_regress: all suspects refuted solo — gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())

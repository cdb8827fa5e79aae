#!/usr/bin/env python3
"""Per-query bench trend across rounds, with anomaly flagging.

The per-round driver artifact (BENCH_r{N}.json) carries a totals-only
stdout line, so the per-query medians live in BENCH_LOCAL.json — one
committed snapshot per round (quiet-box medians, the CANONICAL numbers
per PERF.md "Bench-noise policy"; a plain Bench run writes to target/
and only SPARK_GRAFT_RECORD_MEDIANS=1 refreshes the committed file).
This tool walks that file's git history (plus the working-tree copy),
lines the snapshots up per query, and flags any round-over-round move
beyond --ratio (default 1.5x, either direction).

Since round 15 the artifact also carries a "calib_sec" anchor: the
median of three runs of a fixed DATA-INDEPENDENT workload timed at
record time. When two snapshots both carry it, their medians are
compared after dividing through the anchor ratio (calib_b/calib_a),
so a slower/faster HOST between records no longer reads as a
per-query move — the machine-normalizable protocol the round-14
verdict asked for (the prose ratio-adjudication stays for snapshots
predating the anchor).

Since round 12 the artifact also carries the RAW per-run triples
("runs"). A flagged move is then CLASSIFIED: if the faster side's
median is within ratio of the slower side's MINIMUM run, the move is
explainable as one or two contaminated runs on a shared box and is
reported as noise-suspect, not a regression — exactly the q87/q277
adjudications of rounds 10-11, now decided from the artifact instead
of a judge re-run.

Usage:
  tools/bench_trend.py                  # last 4 committed snapshots + worktree
  tools/bench_trend.py --depth 6       # more history
  tools/bench_trend.py --ratio 2.0     # only flag >2x moves
  tools/bench_trend.py fileA fileB ... # explicit snapshots, oldest first

Explicit files may be raw bench lines ({"metric":"total",...,"queries":
{...}}) or driver wrappers ({"parsed": {...}, "tail": "..."}); for
wrappers the tool reads parsed.queries and falls back to regex-mining
the stdout tail (partial coverage, better than nothing).

Exit status (the PERF.md policy): 0 when every move beyond the ratio
is noise-suspect per the raw runs (or nothing moved), 1 when at least
one move is a CONFIRMED regression (no runs evidence excusing it) — so
a pre-commit loop gates on real regressions without flapping on
shared-box contention.
"""
import argparse
import json
import re
import subprocess
import sys


def snapshot_from_obj(d):
    """(medians, runs, calib) from either bench-line or driver-wrapper
    JSON; runs is {} / calib is None when the snapshot predates those
    artifact fields."""
    queries, runs = {}, {}
    if isinstance(d.get("queries"), dict) and d["queries"]:
        queries = {k: float(v) for k, v in d["queries"].items()}
    else:
        parsed = d.get("parsed") or {}
        if isinstance(parsed.get("queries"), dict) and parsed["queries"]:
            queries = {k: float(v) for k, v in parsed["queries"].items()}
        else:
            tail = d.get("tail", "")
            mined = re.findall(r'"(q\d+[a-z0-9_]*)":([0-9.]+)', tail)
            queries = {k: float(v) for k, v in mined}
    if isinstance(d.get("runs"), dict):
        runs = {k: [float(x) for x in v] for k, v in d["runs"].items()
                if isinstance(v, list) and v}
    calib = d.get("calib_sec")
    calib = float(calib) if isinstance(calib, (int, float)) and calib > 0 else None
    return queries, runs, calib


def load_file(path):
    with open(path) as f:
        return snapshot_from_obj(json.load(f))


def git_snapshots(depth):
    """(label, medians, runs, calib) for the last `depth` commits touching
    BENCH_LOCAL.json, oldest first, plus the worktree copy if it
    differs from HEAD's."""
    log = subprocess.run(
        ["git", "log", "--format=%h %s", "--follow", "--", "BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True).stdout.splitlines()
    commits = [line.split(" ", 1)[0] for line in log[:depth]]
    out = []
    for sha in reversed(commits):
        show = subprocess.run(
            ["git", "show", f"{sha}:BENCH_LOCAL.json"],
            capture_output=True, text=True)
        if show.returncode != 0:
            continue
        q, r, c = snapshot_from_obj(json.loads(show.stdout))
        out.append((sha, q, r, c))
    try:
        q, r, c = load_file("BENCH_LOCAL.json")
        if not out or (q, r) != (out[-1][1], out[-1][2]):
            out.append(("worktree", q, r, c))
    except (OSError, json.JSONDecodeError):
        pass
    return out


def classify(a, b, runs_a, runs_b, ratio):
    """Is an a->b move beyond ratio a regression, a speedup, or noise?

    Noise-suspect when the calm side's median sits within ratio of the
    inflated side's BEST (minimum) run — i.e. at least one run on the
    inflated side saw a quiet box and agreed with the other round.
    A slower move without runs evidence excusing it stays a REGRESSION
    (evidence, not benefit of the doubt); a faster move is a speedup —
    printed so a query that quietly stopped doing work is still
    visible, but never an exit-1 condition."""
    hi_runs = runs_b if b > a else runs_a
    calm = min(a, b)
    if hi_runs and min(hi_runs) <= calm * ratio:
        return "noise-suspect"
    return "REGRESSION" if b > a else "speedup"


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("files", nargs="*",
                    help="explicit snapshot files, oldest first "
                         "(default: BENCH_LOCAL.json git history)")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="flag round-over-round moves beyond this factor")
    ap.add_argument("--depth", type=int, default=4,
                    help="git-history snapshots to include (default 4)")
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore moves where both sides are under this "
                         "(sub-noise-floor queries flap on ratio)")
    args = ap.parse_args()

    if args.files:
        snaps = [(p,) + load_file(p) for p in args.files]
    else:
        snaps = git_snapshots(args.depth)
    if len(snaps) < 2:
        print("need at least 2 snapshots to trend", file=sys.stderr)
        return 2

    flagged = []
    for (la, qa, ra, ca), (lb, qb, rb, cb) in zip(snaps, snaps[1:]):
        # box normalization: divide the newer side through the anchor
        # ratio so host drift between records cancels out of the move
        factor = (cb / ca) if (ca and cb) else 1.0
        if factor != 1.0:
            print(f"box anchor {la} -> {lb}: calib {ca:.2f}s -> {cb:.2f}s "
                  f"(normalizing {lb} medians by /{factor:.2f})")
        for name in sorted(set(qa) | set(qb)):
            a, b0 = qa.get(name), qb.get(name)
            if a is None or b0 is None:
                continue  # added/removed between rounds: shown in summary only
            b = b0 / factor
            if max(a, b) < args.min_sec:
                continue
            lo = max(min(a, b), 1e-9)
            r = max(a, b) / lo
            if r > args.ratio:
                runs_b = [x / factor for x in rb.get(name, [])] or None
                kind = classify(a, b, ra.get(name), runs_b, args.ratio)
                flagged.append((r, name, la, a, lb, b, kind,
                                runs_b if b > a else ra.get(name)))

    labels = " -> ".join(s[0] for s in snaps)
    sizes = ", ".join(str(len(s[1])) for s in snaps)
    print(f"snapshots: {labels}  (queries: {sizes})")
    totals = ", ".join(f"{sum(s[1].values()):.1f}s" for s in snaps)
    print(f"totals:    {totals}")
    added = set(snaps[-1][1]) - set(snaps[0][1])
    removed = set(snaps[0][1]) - set(snaps[-1][1])
    if added:
        print(f"added since {snaps[0][0]}: {len(added)}")
    if removed:
        print(f"removed since {snaps[0][0]}: {sorted(removed)}")

    if not flagged:
        print(f"no per-query move beyond {args.ratio}x "
              f"(floor {args.min_sec}s) — trend clean")
        return 0
    regressions = [f for f in flagged if f[6] == "REGRESSION"]
    print(f"\n{len(flagged)} move(s) beyond {args.ratio}x "
          f"({len(regressions)} confirmed regression(s), "
          f"{len(flagged) - len(regressions)} speedup/noise-suspect):")
    for r, name, la, a, lb, b, kind, hi_runs in sorted(flagged, reverse=True):
        arrow = "SLOWER" if b > a else "faster"
        runs = ("  runs=" + ",".join(f"{x:.2f}" for x in hi_runs)
                if hi_runs else "")
        print(f"  {r:5.2f}x {arrow:6s} {kind:13s} {name:40s} "
              f"{la} {a:7.2f}s -> {lb} {b:7.2f}s{runs}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())

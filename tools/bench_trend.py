#!/usr/bin/env python3
"""Per-query bench trend across rounds, with anomaly flagging.

The per-round driver artifact (BENCH_r{N}.json) carries a totals-only
stdout line, so the per-query medians live in BENCH_LOCAL.json — one
committed snapshot per round. This tool walks that file's git history
(plus the working-tree copy), lines the snapshots up per query, and
flags any round-over-round move beyond --ratio (default 1.5x, either
direction). A q87-class anomaly (14.1s vs a 2.3s committed median,
code untouched) then surfaces in the builder's own loop instead of the
judge's.

Usage:
  tools/bench_trend.py                  # last 4 committed snapshots + worktree
  tools/bench_trend.py --depth 6       # more history
  tools/bench_trend.py --ratio 2.0     # only flag >2x moves
  tools/bench_trend.py fileA fileB ... # explicit snapshots, oldest first

Explicit files may be raw bench lines ({"metric":"total",...,"queries":
{...}}) or driver wrappers ({"parsed": {...}, "tail": "..."}); for
wrappers the tool reads parsed.queries and falls back to regex-mining
the stdout tail (partial coverage, better than nothing).

Exit status: 0 when no query moved beyond the ratio, 1 otherwise — so
a pre-commit loop can gate on it. Queries present in only one of two
adjacent snapshots (newly added / removed) are reported but never
flagged.
"""
import argparse
import json
import re
import subprocess
import sys


def queries_from_obj(d):
    """Per-query medians from either bench-line or driver-wrapper JSON."""
    if isinstance(d.get("queries"), dict) and d["queries"]:
        return {k: float(v) for k, v in d["queries"].items()}
    parsed = d.get("parsed") or {}
    if isinstance(parsed.get("queries"), dict) and parsed["queries"]:
        return {k: float(v) for k, v in parsed["queries"].items()}
    tail = d.get("tail", "")
    mined = re.findall(r'"(q\d+[a-z0-9_]*)":([0-9.]+)', tail)
    return {k: float(v) for k, v in mined}


def load_file(path):
    with open(path) as f:
        return queries_from_obj(json.load(f))


def git_snapshots(depth):
    """(label, queries) for the last `depth` commits touching
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
        out.append((sha, queries_from_obj(json.loads(show.stdout))))
    try:
        wt = load_file("BENCH_LOCAL.json")
        if not out or wt != out[-1][1]:
            out.append(("worktree", wt))
    except (OSError, json.JSONDecodeError):
        pass
    return out


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
        snaps = [(p, load_file(p)) for p in args.files]
    else:
        snaps = git_snapshots(args.depth)
    if len(snaps) < 2:
        print("need at least 2 snapshots to trend", file=sys.stderr)
        return 2

    flagged = []
    for (la, qa), (lb, qb) in zip(snaps, snaps[1:]):
        for name in sorted(set(qa) | set(qb)):
            a, b = qa.get(name), qb.get(name)
            if a is None or b is None:
                continue  # added/removed between rounds: shown in summary only
            if max(a, b) < args.min_sec:
                continue
            lo = max(min(a, b), 1e-9)
            r = max(a, b) / lo
            if r > args.ratio:
                flagged.append((r, name, la, a, lb, b))

    labels = " -> ".join(l for l, _ in snaps)
    sizes = ", ".join(str(len(q)) for _, q in snaps)
    print(f"snapshots: {labels}  (queries: {sizes})")
    totals = ", ".join(f"{sum(q.values()):.1f}s" for _, q in snaps)
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
    print(f"\n{len(flagged)} move(s) beyond {args.ratio}x:")
    for r, name, la, a, lb, b in sorted(flagged, reverse=True):
        arrow = "SLOWER" if b > a else "faster"
        print(f"  {r:5.2f}x {arrow:6s} {name:40s} {la} {a:7.2f}s -> {lb} {b:7.2f}s")
    return 1


if __name__ == "__main__":
    sys.exit(main())

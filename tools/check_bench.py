#!/usr/bin/env python3
"""Mechanical 2x-of-BASELINE contract check (round-14 verdict #2).

Parses the single authoritative min table in BASELINE.md
("## Current recorded mins (authoritative)") and diffs a bench JSON
line (graft.Bench stdout, or a driver BENCH_r{N}.json whose `tail`
holds the line's suffix) against it:

    python3 tools/check_bench.py BENCH_r14.json [--max-ratio 2.0]

With no argument it reads target/bench.json — the complete line
graft.Bench persists on every run (round-15: the stdout tail the driver
stores truncates past ~46 queries, the file never does).

Prints every query whose value exceeds max-ratio x its recorded min,
plus queries missing on either side. Exit 1 on any breach.
"""
import argparse
import json
import re
import sys
from pathlib import Path

BASELINE = Path(__file__).resolve().parent.parent / "BASELINE.md"
HEADER = "## Current recorded mins (authoritative)"


def load_mins():
    text = BASELINE.read_text()
    if HEADER not in text:
        sys.exit(f"BASELINE.md lacks the '{HEADER}' section")
    section = text.split(HEADER, 1)[1]
    # table ends at the next heading
    section = re.split(r"\n#{1,3} ", section, 1)[0]
    mins = {}
    for m in re.finditer(r"^\| *`?([a-z]\d+_\w+)`? *\| *([\d.]+) *\|",
                         section, re.M):
        mins[m.group(1)] = float(m.group(2))
    if not mins:
        sys.exit("no rows parsed from the authoritative min table")
    return mins


def load_raw(path):
    raw = Path(path).read_text()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        # a raw Bench stdout line among other output: take the last {...}
        return json.loads([l for l in raw.splitlines()
                           if l.startswith("{")][-1])


def load_bench(path):
    d = load_raw(path)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if d.get("parsed"):
        return {k: float(v) for k, v in d["parsed"]["queries"].items()}
    # driver artifact: reconstruct from the stored tail fragment
    qs = re.findall(r'"([a-z]\d+_\w+)":(-?[\d.]+)', d.get("tail", ""))
    return {k: float(v) for k, v in qs}


def print_retried(path):
    """Surface the bench's contract-retry telemetry (round-16 verdict #6):
    a breach that was observed and absorbed by the retry's min-kept sample
    must be visible to the adjudication, not vanish from the artifact."""
    try:
        retried = load_raw(path).get("retried") or {}
    except Exception:
        return
    for q, pp in sorted(retried.items()):
        print(f"[retried] {q}: first recorded {pp['pre']:.2f}s, "
              f"kept {pp['post']:.2f}s after the contract retry")


def diff_mode(path_a, path_b, max_ratio=2.0):
    """Two run files: print per-query ratios side by side (round-15
    verdict #7 — this replaces the three manual probe runs the round-15
    breach adjudication needed). Returns a nonzero count when any query's
    max-ratio verdict differs between the runs or a query is present in
    only one file, so scripts can gate on it (round-16 advice: the '<<'
    flag used to hard-code 2x and the mode always exited 0)."""
    a, b = load_bench(path_a), load_bench(path_b)
    mins = load_mins()
    common = sorted(set(a) & set(b))
    flagged = 0
    print(f"{'query':34s} {'A':>8s} {'B':>8s} {'B/A':>6s} {'A/min':>6s} "
          f"{'B/min':>6s}")
    for q in common:
        va, vb = a[q], b[q]
        ratio = vb / va if va > 0 else float("nan")
        m = mins.get(q)
        am = f"{va / m:6.2f}" if m else "     -"
        bm = f"{vb / m:6.2f}" if m else "     -"
        differs = bool(m) and (va > max_ratio * m) != (vb > max_ratio * m)
        flagged += differs
        flag = " <<" if differs else ""
        print(f"{q:34s} {va:8.2f} {vb:8.2f} {ratio:6.2f} {am} {bm}{flag}")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    if only_a:
        print(f"only in A: {', '.join(only_a)}")
    if only_b:
        print(f"only in B: {', '.join(only_b)}")
    sa = sum(v for v in a.values() if v > 0)
    sb = sum(v for v in b.values() if v > 0)
    print(f"{len(common)} common queries; totals A={sa:.1f}s B={sb:.1f}s; "
          f"'<<' marks queries whose {max_ratio}x-of-min verdict differs "
          "between runs")
    return flagged + len(only_a) + len(only_b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?",
                    default=str(BASELINE.parent / "target" / "bench.json"))
    ap.add_argument("bench_b", nargs="?", default=None,
                    help="second run file: switch to side-by-side diff mode")
    ap.add_argument("--max-ratio", type=float, default=2.0)
    args = ap.parse_args()

    if args.bench_b:
        n_flagged = diff_mode(args.bench, args.bench_b, args.max_ratio)
        sys.exit(1 if n_flagged else 0)

    mins = load_mins()
    bench = load_bench(args.bench)
    print_retried(args.bench)

    breaches, warn = [], []
    for q, v in sorted(bench.items()):
        if v < 0:
            breaches.append(f"{q}: ERRORED (-1)")
            continue
        if q not in mins:
            warn.append(f"{q}: not in the authoritative table")
            continue
        r = v / mins[q]
        if r > args.max_ratio:
            breaches.append(f"{q}: {v:.2f}s = {r:.2f}x its min {mins[q]:.2f}s")
        elif r > args.max_ratio * 0.85:
            warn.append(f"{q}: {v:.2f}s = {r:.2f}x its min {mins[q]:.2f}s "
                        "(within 15% of the line)")
    for q in sorted(set(mins) - set(bench)):
        warn.append(f"{q}: in the table but not in this bench "
                    "(truncated tail?)")

    for w in warn:
        print(f"[watch] {w}")
    for b in breaches:
        print(f"[BREACH] {b}")
    n = len(set(bench) & set(mins))
    print(f"{n} queries checked against the authoritative table; "
          f"{len(breaches)} over {args.max_ratio}x, {len(warn)} watches")
    sys.exit(1 if breaches else 0)


if __name__ == "__main__":
    main()

"""Summarize a training run's metrics.jsonl into a markdown curve table.

Used to produce the RUNS.md evidence tables (round-3 verdict item 4: a
sustained real-chip training run with recorded loss curves).  Reads the
JSONL stream every trainer appends per run dir (utils/metrics_log.py) and
prints a markdown table sampling ~N rows evenly across the run, plus a
first-vs-last delta line per metric.

Usage: python tools/summarize_run.py <run_dir_or_jsonl> [--rows 12]
"""

import argparse
import json
import os
import sys


def load(path):
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--rows", type=int, default=12)
    ap.add_argument("--keys", type=str, default=None,
                    help="comma-separated metric keys (default: all numeric)")
    args = ap.parse_args()

    recs = load(args.path)
    if not recs:
        print("empty metrics stream", file=sys.stderr)
        sys.exit(1)

    skip = {"ts", "step", "epoch"}
    if args.keys:
        keys = args.keys.split(",")
    else:
        # union numeric keys across ALL records (a metric that first appears
        # mid-run must not be silently dropped), first-seen order
        keys, seen = [], set()
        for r in recs:
            for k, v in r.items():
                if (k not in skip and k not in seen
                        and isinstance(v, (int, float))
                        and not isinstance(v, bool)):
                    seen.add(k)
                    keys.append(k)

    n = len(recs)
    k = min(args.rows, n)
    idxs = sorted({round(i * (n - 1) / max(1, k - 1)) for i in range(k)})

    header = ["step"] + (["epoch"] if "epoch" in recs[0] else []) + keys
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    def num(v):
        # coerce missing / null / non-numeric values to nan so a single odd
        # record cannot crash the table formatting
        return v if isinstance(v, (int, float)) and not isinstance(v, bool) \
            else float("nan")

    for i in idxs:
        r = recs[i]
        row = [str(r.get("step", i))]
        if "epoch" in recs[0]:
            row.append(str(r.get("epoch", "")))
        row += [f"{num(r.get(k)):.4g}" for k in keys]
        print("| " + " | ".join(row) + " |")

    print()
    t0, t1 = recs[0].get("ts"), recs[-1].get("ts")
    wall = (f"{(t1 - t0)/60:.1f} min logged wall-clock, "
            if isinstance(t0, (int, float)) and isinstance(t1, (int, float))
            else "")
    print(f"{n} log points, {wall}final step {recs[-1].get('step', n - 1)}.")

    def first_last(k):
        vals = [num(r.get(k)) for r in recs]
        vals = [v for v in vals if v == v]  # drop nans
        return (vals[0], vals[-1]) if vals else (None, None)

    for k in keys:
        a, b = first_last(k)
        if a is not None and b is not None and a != 0:
            print(f"- `{k}`: {a:.4g} → {b:.4g} ({b/a:.2f}×)")


if __name__ == "__main__":
    main()

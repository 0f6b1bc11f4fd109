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
        keys = [k for k in recs[0] if k not in skip
                and isinstance(recs[0][k], (int, float))]

    n = len(recs)
    idxs = sorted({round(i * (n - 1) / max(1, args.rows - 1))
                   for i in range(min(args.rows, n))})

    header = ["step"] + (["epoch"] if "epoch" in recs[0] else []) + keys
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for i in idxs:
        r = recs[i]
        row = [str(r["step"])]
        if "epoch" in recs[0]:
            row.append(str(r.get("epoch", "")))
        row += [f"{r.get(k, float('nan')):.4g}" for k in keys]
        print("| " + " | ".join(row) + " |")

    print()
    wall = recs[-1]["ts"] - recs[0]["ts"]
    print(f"{n} log points, {wall/60:.1f} min logged wall-clock, "
          f"final step {recs[-1]['step']}.")
    for k in keys:
        a, b = recs[0].get(k), recs[-1].get(k)
        if a is not None and b is not None and a != 0:
            print(f"- `{k}`: {a:.4g} → {b:.4g} ({b/a:.2f}×)")


if __name__ == "__main__":
    main()

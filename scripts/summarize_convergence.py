#!/usr/bin/env python
"""Summarize a trainer epoch_log.jsonl into a markdown table + saturation
check for docs/ROUND4.md (VERDICT r3 #2: show validation saturating, not
declining, and compare refine recipes).

  python scripts/summarize_convergence.py logs/disk_run_r4/lidf60/epoch_log.jsonl \
      [--splits real_novel,...] [--every 5] [--metric a1]
"""

import argparse
import json

import numpy as np


def load(path):
    return [json.loads(l) for l in open(path)]


def table(rows, splits, every, metrics):
    out = []
    hdr = ["ep", "train_err"] + [f"{s}:{m}" for s in splits for m in metrics]
    out.append("| " + " | ".join(hdr) + " |")
    out.append("|" + "---|" * len(hdr))
    picks = list(range(0, len(rows), every))
    if picks[-1] != len(rows) - 1:
        picks.append(len(rows) - 1)
    for i in picks:
        r = rows[i]
        cells = [str(r["epoch"]), f"{r['train']['err']:.4f}"]
        for s in splits:
            v = r.get("valid", {}).get(s, {})
            cells += [f"{v.get(m, float('nan')):.4f}" for m in metrics]
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def saturation(rows, split, metric="a1", tail=5, higher_better=True):
    """Compare the tail-window mean against the best sliding window of the
    same width: saturated (still at/near peak) vs declining (peak was
    earlier)."""
    series = [r.get("valid", {}).get(split, {}).get(metric) for r in rows]
    series = [s for s in series if s is not None]
    if len(series) < tail + 1:
        return "n/a (too few epochs)"
    arr = np.asarray(series, np.float64)
    win = np.convolve(arr, np.ones(tail) / tail, mode="valid")
    peak_i = int(np.argmax(win) if higher_better else np.argmin(win))
    tail_mean, peak = win[-1], win[peak_i]
    if higher_better:
        ok = tail_mean >= peak - 0.02 * max(abs(peak), 1e-9)
    else:
        ok = tail_mean <= peak + 0.02 * max(abs(peak), 1e-9)
    state = "SATURATED (tail ~= peak)" if ok else \
        f"DECLINING (peak window at epoch ~{peak_i + tail - 1})"
    return (f"{split}:{metric} tail{tail}-mean={tail_mean:.4f} "
            f"best-window={peak:.4f} -> {state}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--splits",
                    default="synthetic_known,synthetic_novel,real_known,real_novel")
    ap.add_argument("--every", type=int, default=5)
    ap.add_argument("--metrics", default="a1,rmse")
    args = ap.parse_args()

    rows = load(args.log)
    splits = args.splits.split(",")
    metrics = args.metrics.split(",")
    print(table(rows, splits, args.every, metrics))
    print()
    for s in splits:
        for m in metrics:
            print(saturation(rows, s, m, higher_better=(m.startswith("a"))))


if __name__ == "__main__":
    main()

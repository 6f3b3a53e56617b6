#!/usr/bin/env python
"""Summarize a trainer epoch_log.jsonl into a markdown table + saturation
check for docs/ROUND4.md (VERDICT r3 #2: show validation saturating, not
declining, and compare refine recipes).

  python scripts/summarize_convergence.py logs/disk_run_r4/lidf60/epoch_log.jsonl \
      [--splits real_novel,...] [--every 5] [--metric a1]
"""

import argparse
import json
import sys

import numpy as np

# only the δ-threshold accuracies (and end-voxel acc) are higher-is-better;
# rmse/mae/abs_rel/log10/... all go down (train/metrics.py)
HIGHER_BETTER = {"a1", "a2", "a3", "acc"}


def load(path):
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            # a partially-written tail line (run died mid-write) — skip
            print(f"# skipping unparseable line in {path}", file=sys.stderr)
    return rows


def table(rows, splits, every, metrics):
    out = []
    hdr = ["ep", "train_err"] + [f"{s}:{m}" for s in splits for m in metrics]
    out.append("| " + " | ".join(hdr) + " |")
    out.append("|" + "---|" * len(hdr))
    if not rows:
        return "\n".join(out + ["(no complete epochs in log)"])
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


def saturation(rows, split, metric="a1", tail=5, higher_better=None):
    """Compare the tail-window mean against the best sliding window of the
    same width: saturated (still at/near peak) vs declining (peak was
    earlier). Epoch labels come from each record's actual epoch number, so
    runs with ``training.valid_interval > 1`` (sparse validation) report
    correct epochs; the tail window is then ``tail`` VALIDATION POINTS, not
    epochs."""
    if higher_better is None:
        higher_better = metric in HIGHER_BETTER
    pts = [(r["epoch"], r.get("valid", {}).get(split, {}).get(metric))
           for r in rows]
    pts = [(e, v) for e, v in pts if v is not None]
    if len(pts) < tail + 1:
        return f"{split}:{metric} n/a (too few validation points)"
    epochs = [e for e, _ in pts]
    arr = np.asarray([v for _, v in pts], np.float64)
    win = np.convolve(arr, np.ones(tail) / tail, mode="valid")
    peak_i = int(np.argmax(win) if higher_better else np.argmin(win))
    tail_mean, peak = win[-1], win[peak_i]
    if higher_better:
        ok = tail_mean >= peak - 0.02 * max(abs(peak), 1e-9)
    else:
        ok = tail_mean <= peak + 0.02 * max(abs(peak), 1e-9)
    state = "SATURATED (tail ~= peak)" if ok else \
        f"DECLINING (peak window ends at epoch {epochs[peak_i + tail - 1]})"
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
            print(saturation(rows, s, m))


if __name__ == "__main__":
    main()

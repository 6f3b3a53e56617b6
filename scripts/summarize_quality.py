#!/usr/bin/env python
"""Summarize (and regression-check) the frozen procedural quality benchmark.

Reads the per-image test CSVs produced by `scripts/run_disk_r5.sh`
(test_lidf_only / test_refine_plain / test_refine_hardneg × 4 splits),
prints the per-split MEAN table in BASELINE.md format, per-variant
tail statistics (median / p95 / max per-image RMSE — the round-4 hardneg
anomaly was a single-image tail blowup invisible in MEANs), and, when
given ``--gate``, compares against the committed target table and exits
non-zero on regression beyond tolerance.

  python scripts/summarize_quality.py logs/disk_run_r5
  python scripts/summarize_quality.py logs/disk_run_r5 --gate docs/quality_targets_r5.json
"""

import argparse
import csv
import json
import os.path as osp
import sys

import numpy as np

SPLITS = ("real_known", "real_novel", "synthetic_known", "synthetic_novel")
VARIANTS = ("test_lidf_only", "test_refine_plain", "test_refine_hardneg")
COLS = ("rmse", "rel", "mae", "a1", "a2", "a3")


def load_csv(path):
    rows = list(csv.reader(open(path)))
    data = [r for r in rows[1:] if r and r[0] != "MEAN"]
    vals = np.asarray([[float(x) for x in r[1:7]] for r in data], np.float64)
    return {"n": len(data), "mean": vals.mean(0), "rmse_all": vals[:, 0]}


def collect(log_dir):
    out = {}
    for v in VARIANTS:
        for s in SPLITS:
            p = osp.join(log_dir, v, "result", f"{s}.csv")
            if osp.exists(p):
                out[(v, s)] = load_csv(p)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--gate", default=None,
                    help="targets json; exit 1 on regression beyond --tol")
    ap.add_argument("--tol", type=float, default=0.02,
                    help="allowed absolute drop in a1 / rise in rmse")
    ap.add_argument("--dump", default=None, help="write targets json here")
    args = ap.parse_args()

    res = collect(args.log_dir)
    if not res:
        print(f"no result CSVs under {args.log_dir}", file=sys.stderr)
        return 1

    print("| split | n | stage1 δ1.05 | plain δ1.05 | hardneg δ1.05 |"
          " stage1 RMSE | plain RMSE | hardneg RMSE |")
    print("|---|---|---|---|---|---|---|---|")
    for s in SPLITS:
        cells = [s]
        n = next((res[(v, s)]["n"] for v in VARIANTS if (v, s) in res), 0)
        cells.append(str(n))
        for col, idx in (("a1", 3), ("rmse", 0)):
            for v in VARIANTS:
                r = res.get((v, s))
                cells.append(f"{r['mean'][idx]:.3f}" if r else "—")
        print("| " + " | ".join(cells) + " |")

    print("\nper-image RMSE tails (median / p95 / max):")
    for v in VARIANTS:
        for s in SPLITS:
            r = res.get((v, s))
            if r is None:
                continue
            a = r["rmse_all"]
            print(f"  {v:22s} {s:17s} {np.median(a):.3f} / "
                  f"{np.percentile(a, 95):.3f} / {a.max():.3f}")

    table = {
        f"{v}/{s}": {c: float(r["mean"][i]) for i, c in enumerate(COLS)}
        for (v, s), r in res.items()}

    if args.dump:
        with open(args.dump, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        print(f"\nwrote targets to {args.dump}")

    if args.gate:
        with open(args.gate) as f:
            targets = json.load(f)
        bad = []
        for k, tgt in targets.items():
            got = table.get(k)
            if got is None:
                bad.append(f"{k}: MISSING")
                continue
            if got["a1"] < tgt["a1"] - args.tol:
                bad.append(f"{k}: a1 {got['a1']:.3f} < target "
                           f"{tgt['a1']:.3f} - {args.tol}")
            if got["rmse"] > tgt["rmse"] + args.tol:
                bad.append(f"{k}: rmse {got['rmse']:.3f} > target "
                           f"{tgt['rmse']:.3f} + {args.tol}")
        if bad:
            print("\nQUALITY REGRESSIONS:\n  " + "\n  ".join(bad))
            return 1
        print(f"\nquality gate OK ({len(targets)} rows within ±{args.tol})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Complete the depth of RGB-D frames from files (DepthCompleter CLI).

The file-level analog of the reference's ``exp_type: test`` workflow
(train_refine.py:625-664), for users who just want completed depth maps:

  PYTHONPATH=/root/repo python scripts/complete_depth.py \
      --lidf_ckpt logs/run_lidf/ckpt --refine_ckpt logs/run_refine/ckpt \
      --rgb frame-rgb.jpg --depth frame-depth.exr \
      --fx 577.87 --fy 577.87 --cx 320 --cy 240 --out completed.npy

``--depth`` accepts .exr (single-channel float meters, the ClearGrasp
format), .npy, or 16-bit .png in millimeters. ``--out`` writes .npy or
16-bit millimeter .png by extension. Repeat --rgb/--depth for batches.
"""

import argparse
import sys

import numpy as np


def load_depth(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".exr"):
        from implicit_depth_tpu.data.exr import exr_loader
        return exr_loader(path, ndim=1).astype(np.float32)
    import cv2
    d = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32) / 1000.0  # 16-bit png, millimeters


def save_depth(path: str, depth: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, depth.astype(np.float32))
    else:
        import cv2
        cv2.imwrite(path, (depth * 1000.0).astype(np.uint16))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lidf_ckpt", required=True,
                   help="stage-1 orbax ckpt dir (<workdir>/ckpt)")
    p.add_argument("--refine_ckpt", default=None,
                   help="optional stage-2 ckpt dir")
    p.add_argument("--cfg_paths", nargs="*", default=[],
                   help="config yamls (defaults otherwise)")
    p.add_argument("--ckpt_name", default="best_network")
    p.add_argument("--rgb", action="append", required=True)
    p.add_argument("--depth", action="append", required=True)
    p.add_argument("--fx", type=float, required=True)
    p.add_argument("--fy", type=float, required=True)
    p.add_argument("--cx", type=float, required=True)
    p.add_argument("--cy", type=float, required=True)
    p.add_argument("--out", action="append", required=True,
                   help="output path per frame (.npy or .png)")
    args = p.parse_args(argv)
    if not (len(args.rgb) == len(args.depth) == len(args.out)):
        p.error("--rgb/--depth/--out counts must match")

    import cv2

    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.infer import DepthCompleter

    cfg = load_config(*args.cfg_paths, overrides={"mask_type": "all"})
    dc = DepthCompleter.from_checkpoint(
        args.lidf_ckpt, refine_ckpt_dir=args.refine_ckpt, cfg=cfg,
        ckpt_name=args.ckpt_name, batch_size=len(args.rgb))

    rgbs, depths = [], []
    for rp, dp in zip(args.rgb, args.depth):
        rgb = cv2.imread(rp, cv2.IMREAD_COLOR)
        if rgb is None:
            raise FileNotFoundError(rp)
        rgbs.append(cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB))
        depths.append(load_depth(dp))
    intr = [(args.fx, args.fy, args.cx, args.cy)] * len(rgbs)
    out = dc.complete_batch(rgbs, depths, intr)
    for i, path in enumerate(args.out):
        save_depth(path, np.asarray(out["depth"][i]))
        miss = int((depths[i] == 0).sum())
        print(f"{path}: completed {miss} missing pixels")


if __name__ == "__main__":
    sys.exit(main())

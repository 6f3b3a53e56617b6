#!/usr/bin/env python
"""Host-side data-loader throughput vs the TPU step time (VERDICT r1 #10).

Measures batches/s of the thread-pool DataLoader (data/loader.py) on
(a) the procedural synthetic dataset at production image size and
(b) a generated ClearGrasp-synthetic fixture tree (real decode path: JPEG +
EXR + connected components + augmentation), and compares against a target
device step time.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_loader.py
"""

import json
import tempfile
import time

import numpy as np

from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.datasets import get_dataset
from implicit_depth_tpu.data.loader import DataLoader

H, W, BS = 240, 320, 4
TARGET_STEP_MS = 170.0  # round-1 train step; loader must beat this


def timed(ds, n_batches=24, workers=4, worker_type="thread"):
    loader = DataLoader(ds, BS, shuffle=True, num_workers=workers,
                        worker_type=worker_type)
    it = iter(loader.epoch(0))
    next(it)  # warm the pool
    t0 = time.perf_counter()
    done = 1
    for b in it:
        done += 1
        if done >= n_batches:
            break
    dt = (time.perf_counter() - t0) / max(done - 1, 1)
    loader.close()
    return dt


def main():
    cfg = load_config(overrides={
        "dataset": {"img_height": H, "img_width": W, "synthetic_len": 128,
                    "use_data_augmentation": True}})

    ds = get_dataset(cfg.dataset, "train")
    for workers in (1, 4, 8):
        dt = timed(ds, workers=workers)
        print(json.dumps({
            "dataset": "synthetic", "workers": workers,
            "batch_ms": round(dt * 1e3, 1),
            "batches_per_sec": round(1 / dt, 2),
            "headroom_vs_step": round(TARGET_STEP_MS / (dt * 1e3), 2),
        }), flush=True)

    # ClearGrasp-synthetic tree at production source resolution (1080p like
    # the real dataset) — exercises the full decode path: JPEG read,
    # chromatic/noise aug, resize, connected components, EXR depth, xyz.
    with tempfile.TemporaryDirectory() as td:
        root = _mk_tree(td, n=24, h_src=1080, w_src=1440)
        cfg2 = load_config(overrides={"dataset": {
            "type": "cleargrasp_synthetic", "cleargrasp_root_dir": root,
            "img_height": H, "img_width": W,
            "use_data_augmentation": True, "depth_aug": True,
            "corrupt_table": True}})
        ds2 = get_dataset(cfg2.dataset, "train")
        for workers, wt in ((4, "thread"), (4, "process"), (8, "process"),
                            (16, "process")):
            dt = timed(ds2, n_batches=12, workers=workers, worker_type=wt)
            print(json.dumps({
                "dataset": "cleargrasp_syn_1080p", "workers": workers,
                "worker_type": wt,
                "batch_ms": round(dt * 1e3, 1),
                "batches_per_sec": round(1 / dt, 2),
                "headroom_vs_step": round(TARGET_STEP_MS / (dt * 1e3), 2),
            }), flush=True)


def _mk_tree(root, n, h_src, w_src):
    import cv2
    import os
    import os.path as osp

    from implicit_depth_tpu.data.exr import write_exr
    from implicit_depth_tpu.data.seg_io import imwrite_indexed

    scene = osp.join(root, "cleargrasp-dataset-train", "scene1")
    for sub in ("rgb-imgs", "segmentation-masks", "depth-imgs-rectified",
                "json-files"):
        os.makedirs(osp.join(scene, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        stem = f"{i:09d}"
        rgb = rng.integers(0, 255, (h_src, w_src, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(scene, "rgb-imgs", f"{stem}-rgb.jpg"), rgb)
        mask = np.zeros((h_src, w_src), np.uint8)
        mask[h_src // 4: h_src // 2, w_src // 4: w_src // 2] = 255
        imwrite_indexed(osp.join(scene, "segmentation-masks",
                                 f"{stem}-segmentation-mask.png"), mask)
        depth = rng.uniform(0.5, 2.0, (h_src, w_src)).astype(np.float32)
        write_exr(osp.join(scene, "depth-imgs-rectified",
                           f"{stem}-depth-rectified.exr"), {"R": depth})
        meta = {"camera": {"field_of_view": {"x_axis_rads": 1.2,
                                             "y_axis_rads": 0.75}},
                "image": {"height_px": h_src, "width_px": w_src}}
        with open(osp.join(scene, "json-files", f"{stem}-masks.json"), "w") as f:
            json.dump(meta, f)
    return root


if __name__ == "__main__":
    main()

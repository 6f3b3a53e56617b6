#!/usr/bin/env python
"""Render procedural scenes into the EXACT on-disk layouts the reference
datasets use, so the full reference workflow — `configs/train_lidf.yaml`
mixed ClearGrasp+Omniverse training, the 4-split validation, `exp_type:
test` per-image CSVs — runs end-to-end from real files on this machine
(the published datasets are not downloadable here; the format, globbing,
camera models and corrupt-mask construction are what this exercises).

Layouts written (reference loaders that read them):
  <out>/cleargrasp/cleargrasp-dataset-train/<scene>/
      rgb-imgs/NNNNNNNNN-rgb.jpg
      segmentation-masks/NNNNNNNNN-segmentation-mask.png   (indexed, 255=transparent)
      depth-imgs-rectified/NNNNNNNNN-depth-rectified.exr   (R channel, meters)
      json-files/NNNNNNNNN-masks.json                      (FoV camera)
          ≙ cleargrasp_synthetic_dataset.py:41-57
  <out>/cleargrasp/cleargrasp-dataset-test-val/{synthetic-val,synthetic-test}/...
  <out>/cleargrasp/cleargrasp-dataset-test-val/{real-val,real-test}/{d415,d435}/
      NNNNNNNNN-transparent-rgb-img.jpg / -mask.png /
      -transparent-depth-img.exr / -opaque-depth-img.exr
      camera_intrinsics.yaml
          ≙ cleargrasp_dataset.py:37-58,123-151
  <out>/omniverse/{train,small_test}/batch0/NNNNN.h5
      rgb_glass, instance_seg, semantic_seg (stacked one-hot), depth
      (disparity = 0.01/m), camera/{pose,focal_length,*_aperture}
          ≙ omniverse_dataset.py:35-142

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/make_disk_datasets.py \
      --out datasets_disk --n_train 24 --n_val 4 --n_test 4 --src_h 480 --src_w 640
"""

import argparse
import json
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from implicit_depth_tpu.data.exr import write_exr  # noqa: E402
from implicit_depth_tpu.data.seg_io import imwrite_indexed  # noqa: E402
from implicit_depth_tpu.data.synthetic import synthetic_scene_raw  # noqa: E402


def _transparent_mask(scene) -> np.ndarray:
    m = np.zeros(scene["depth"].shape, bool)
    for om, tr in zip(scene["object_masks"], scene["object_transparent"]):
        if tr:
            m |= om
    return m


def write_cleargrasp_syn(root: str, n: int, rng, src_hw, scene_name="scene0"):
    """One scene dir with n frames (the loader globs <root>/*/rgb-imgs)."""
    h, w = src_hw
    scene_dir = osp.join(root, scene_name)
    for sub in ("rgb-imgs", "segmentation-masks", "depth-imgs-rectified",
                "json-files"):
        os.makedirs(osp.join(scene_dir, sub), exist_ok=True)
    for i in range(n):
        s = synthetic_scene_raw(rng, h, w)
        stem = f"{i:09d}"
        cv2.imwrite(osp.join(scene_dir, "rgb-imgs", f"{stem}-rgb.jpg"),
                    cv2.cvtColor(s["rgb_u8"], cv2.COLOR_RGB2BGR))
        mask = (_transparent_mask(s) * 255).astype(np.uint8)
        imwrite_indexed(osp.join(scene_dir, "segmentation-masks",
                                 f"{stem}-segmentation-mask.png"), mask)
        write_exr(osp.join(scene_dir, "depth-imgs-rectified",
                           f"{stem}-depth-rectified.exr"), {"R": s["depth"]})
        meta = {"camera": {"field_of_view": {
                    "x_axis_rads": float(s["fov_x"]),
                    "y_axis_rads": float(s["fov_y"])}},
                "image": {"height_px": h, "width_px": w}}
        with open(osp.join(scene_dir, "json-files", f"{stem}-masks.json"),
                  "w") as f:
            json.dump(meta, f)


def write_cleargrasp_real(root: str, n: int, rng, src_hw, camera="d415"):
    h, w = src_hw
    d = osp.join(root, camera)
    os.makedirs(d, exist_ok=True)
    # one intrinsics yaml per camera dir (cleargrasp_dataset.py:37-58)
    probe = synthetic_scene_raw(rng, h, w)
    with open(osp.join(d, "camera_intrinsics.yaml"), "w") as f:
        f.write(f"fx: {float(probe['fx'])}\nfy: {float(probe['fy'])}\n"
                f"cx: {float(probe['cx'])}\ncy: {float(probe['cy'])}\n")
    for i in range(n):
        s = synthetic_scene_raw(rng, h, w)
        stem = f"{i:09d}"
        cv2.imwrite(osp.join(d, f"{stem}-transparent-rgb-img.jpg"),
                    cv2.cvtColor(s["rgb_u8"], cv2.COLOR_RGB2BGR))
        tmask = _transparent_mask(s)
        imwrite_indexed(osp.join(d, f"{stem}-mask.png"),
                        (tmask * 255).astype(np.uint8))
        # transparent sensor: depth missing on the transparent object
        d_transparent = s["depth"] * (~tmask)
        write_exr(osp.join(d, f"{stem}-transparent-depth-img.exr"),
                  {"R": d_transparent.astype(np.float32)})
        write_exr(osp.join(d, f"{stem}-opaque-depth-img.exr"),
                  {"R": s["depth"]})


def write_omniverse(root: str, n: int, rng, src_hw, batch="batch0"):
    import h5py
    h, w = src_hw
    d = osp.join(root, batch)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        s = synthetic_scene_raw(rng, h, w)
        n_obj = s["object_masks"].shape[0]
        inst = s["object_masks"].astype(np.uint8)           # (n_obj, H, W)
        # semantic_seg rows are CLASS planes; loader derives per-pixel
        # semantic id = sum(plane_k * (k+1)); transparent == id 2
        sem = np.zeros((2, h, w), np.uint8)
        for om, tr in zip(s["object_masks"], s["object_transparent"]):
            sem[1 if tr else 0] |= om.astype(np.uint8)
        with h5py.File(osp.join(d, f"{i:05d}.h5"), "w") as f:
            f["rgb_glass"] = s["rgb_u8"]
            f["instance_seg"] = inst
            f["semantic_seg"] = sem
            f["depth"] = (0.01 / np.maximum(s["depth"], 1e-6)
                          ).astype(np.float32)              # disparity
            cam = f.create_group("camera")
            cam["pose"] = np.eye(4, dtype=np.float32)
            # focal/aperture consistent with the scene's fx/fy
            # (fx = focal/horiz_aperture * W, omniverse_dataset.py:124-142)
            focal = 24.0
            cam["focal_length"] = np.asarray([focal], np.float32)
            cam["horizontal_aperture"] = np.asarray(
                [focal * w / float(s["fx"])], np.float32)
            cam["vertical_aperture"] = np.asarray(
                [focal * h / float(s["fy"])], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets_disk")
    ap.add_argument("--n_train", type=int, default=24,
                    help="frames per train source (cg-syn scene / omniverse)")
    ap.add_argument("--n_val", type=int, default=4)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--src_h", type=int, default=480)
    ap.add_argument("--src_w", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    hw = (args.src_h, args.src_w)
    rng = np.random.default_rng(args.seed)
    cg = osp.join(args.out, "cleargrasp")
    omni = osp.join(args.out, "omniverse")

    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-train"),
                         args.n_train, rng, hw)
    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-test-val",
                                  "synthetic-val"), args.n_val, rng, hw)
    write_cleargrasp_syn(osp.join(cg, "cleargrasp-dataset-test-val",
                                  "synthetic-test"), args.n_test, rng, hw)
    write_cleargrasp_real(osp.join(cg, "cleargrasp-dataset-test-val",
                                   "real-val"), args.n_val, rng, hw, "d415")
    write_cleargrasp_real(osp.join(cg, "cleargrasp-dataset-test-val",
                                   "real-test"), args.n_test, rng, hw, "d435")
    # omniverse train split_ratio applies inside the loader; give it enough
    # files that train (90%) and valid (10%) are both non-empty
    write_omniverse(osp.join(omni, "train"), args.n_train, rng, hw)
    write_omniverse(osp.join(omni, "small_test"), args.n_test, rng, hw)

    n_files = sum(len(fs) for _, _, fs in os.walk(args.out))
    print(f"wrote {n_files} files under {args.out}/ "
          f"(cleargrasp + omniverse reference layouts)")


if __name__ == "__main__":
    main()

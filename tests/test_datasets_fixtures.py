"""Exercise the real dataset loaders against miniature on-disk fixtures
(generated ClearGrasp-synthetic tree, ClearGrasp-real tree, Omniverse h5)."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from implicit_depth_tpu.config import Config
from implicit_depth_tpu.data.datasets import get_dataset
from implicit_depth_tpu.data.exr import write_exr
from implicit_depth_tpu.data.loader import DataLoader
from implicit_depth_tpu.data.seg_io import imwrite_indexed

H_SRC, W_SRC = 72, 96
PARAMS = {
    "img_width": 64, "img_height": 48, "split_ratio": 0.9,
    "use_data_augmentation": True, "depth_aug": True, "corrupt_table": True,
    "corrupt_all_pix": False, "omni_corrupt_all": True, "max_depth": 4,
    "ellipse_dropout_mean": 2, "ellipse_gamma_shape": 4.0,
    "ellipse_gamma_scale": 1.0, "gamma_shape": 1000.0, "gamma_scale": 0.001,
    "gaussian_scale": 0.005, "gp_rescale_factor": 4,
}


def _mk_cleargrasp_syn(root, n=4):
    scene = osp.join(root, "cleargrasp-dataset-train", "scene1")
    for sub in ("rgb-imgs", "segmentation-masks", "depth-imgs-rectified", "json-files"):
        os.makedirs(osp.join(scene, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        stem = f"{i:09d}"
        rgb = rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(scene, "rgb-imgs", f"{stem}-rgb.jpg"), rgb)
        mask = np.zeros((H_SRC, W_SRC), np.uint8)
        mask[20:40, 30:60] = 255
        imwrite_indexed(osp.join(scene, "segmentation-masks",
                                 f"{stem}-segmentation-mask.png"), mask)
        depth = rng.uniform(0.5, 2.0, (H_SRC, W_SRC)).astype(np.float32)
        write_exr(osp.join(scene, "depth-imgs-rectified",
                           f"{stem}-depth-rectified.exr"), {"R": depth})
        meta = {"camera": {"field_of_view": {"x_axis_rads": 1.2, "y_axis_rads": 0.75}},
                "image": {"height_px": H_SRC, "width_px": W_SRC}}
        with open(osp.join(scene, "json-files", f"{stem}-masks.json"), "w") as f:
            json.dump(meta, f)
    return root


def _mk_cleargrasp_real(root, n=2):
    d = osp.join(root, "cleargrasp-dataset-test-val", "real-val", "d415")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(1)
    with open(osp.join(d, "camera_intrinsics.yaml"), "w") as f:
        f.write("fx: 90.0\nfy: 90.0\ncx: 48.0\ncy: 36.0\n")
    for i in range(n):
        stem = f"{i:09d}"
        rgb = rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(d, f"{stem}-transparent-rgb-img.jpg"), rgb)
        mask = np.zeros((H_SRC, W_SRC), np.uint8)
        mask[10:30, 10:40] = 255
        imwrite_indexed(osp.join(d, f"{stem}-mask.png"), mask)
        dt = rng.uniform(0.5, 2.0, (H_SRC, W_SRC)).astype(np.float32)
        dt[10:30, 10:40] = 0.0
        write_exr(osp.join(d, f"{stem}-transparent-depth-img.exr"), {"R": dt})
        write_exr(osp.join(d, f"{stem}-opaque-depth-img.exr"),
                  {"R": rng.uniform(0.5, 2.0, (H_SRC, W_SRC)).astype(np.float32)})
    return root


def _mk_omniverse(root, n=3):
    import h5py
    d = osp.join(root, "train", "batch0")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(2)
    for i in range(n):
        with h5py.File(osp.join(d, f"{i:05d}.h5"), "w") as f:
            f["rgb_glass"] = rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
            inst = np.zeros((2, H_SRC, W_SRC), np.uint8)
            inst[0, 5:25, 5:35] = 1      # object 1 (transparent)
            inst[1, 40:60, 50:80] = 1    # object 2 (opaque)
            f["instance_seg"] = inst
            sem = np.zeros((2, H_SRC, W_SRC), np.uint8)
            sem[1, 5:25, 5:35] = 1       # semantic id 2 == transparent
            sem[0, 40:60, 50:80] = 1     # semantic id 1 == opaque
            f["semantic_seg"] = sem
            depth_m = rng.uniform(0.5, 2.0, (H_SRC, W_SRC)).astype(np.float32)
            f["depth"] = (0.01 / depth_m).astype(np.float32)  # disparity
            cam = f.create_group("camera")
            cam["pose"] = np.eye(4, dtype=np.float32)
            cam["focal_length"] = np.asarray([24.0], np.float32)
            cam["horizontal_aperture"] = np.asarray([20.0], np.float32)
            cam["vertical_aperture"] = np.asarray([15.0], np.float32)
    return root


def _check_sample(s, w=64, h=48):
    assert s["rgb"].shape == (h, w, 3)
    assert s["xyz"].shape == (h, w, 3)
    assert s["xyz_corrupt"].shape == (h, w, 3)
    assert s["corrupt_mask"].shape == (h, w)
    assert s["corrupt_mask"].max() <= 1.0
    assert np.isfinite(s["xyz"]).all()
    assert float(s["fx"]) > 0
    # zero-depth pixels in the corrupt map all lie inside the corrupt mask
    # (the corrupt_table aug EXPANDS the mask after depth corruption, so the
    # mask is a superset of the zeroed region — reference behavior)
    zeroed = s["depth_corrupt"] == 0.0
    assert np.all(s["corrupt_mask"][zeroed] > 0.5)
    assert zeroed.any()


def test_cleargrasp_synthetic_fixture(tmp_path):
    root = _mk_cleargrasp_syn(str(tmp_path))
    cfg = Config(dict(PARAMS, type="cleargrasp_synthetic",
                      cleargrasp_root_dir=root, omniverse_root_dir=None))
    ds = get_dataset(cfg, "train")
    assert len(ds) == 3  # 90% of 4
    _check_sample(ds[0])
    # augmentation reproducibility: same idx+epoch -> identical sample
    a, b = ds.__getitem__(1, epoch=2), ds.__getitem__(1, epoch=2)
    np.testing.assert_allclose(a["xyz_corrupt"], b["xyz_corrupt"])
    c = ds.__getitem__(1, epoch=3)
    assert not np.allclose(a["rgb"], c["rgb"])  # different epoch, different aug


def test_cleargrasp_real_fixture(tmp_path):
    root = _mk_cleargrasp_real(str(tmp_path))
    cfg = Config(dict(PARAMS, type="cleargrasp_real",
                      cleargrasp_root_dir=root, omniverse_root_dir=None))
    ds = get_dataset(cfg, "valid", obj_type="known")
    assert len(ds) == 2
    s = ds[0]
    _check_sample(s)
    assert s["item_path"].startswith("real-val_d415_")
    # real data: valid mask excludes zero-depth pixels
    assert not np.any((s["valid_mask"] > 0) & (s["depth_corrupt"] == 0))


def test_omniverse_fixture(tmp_path):
    root = _mk_omniverse(str(tmp_path))
    cfg = Config(dict(PARAMS, type="omniverse", cleargrasp_root_dir=None,
                      omniverse_root_dir=root))
    ds = get_dataset(cfg, "train")
    assert len(ds) == 2  # 90% of 3
    s = ds[0]
    _check_sample(s)
    assert s["depth"].max() <= PARAMS["max_depth"] + 1e-5


def test_mixed_fixture_through_loader(tmp_path):
    cg = _mk_cleargrasp_syn(str(tmp_path / "cg"))
    om = _mk_omniverse(str(tmp_path / "om"))
    cfg = Config(dict(PARAMS, type="mixed", cleargrasp_root_dir=cg,
                      omniverse_root_dir=om))
    ds = get_dataset(cfg, "train")
    assert len(ds) == 5
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0, num_workers=2)
    batches = list(dl.epoch(0))
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (2, 48, 64, 3)
    assert np.isfinite(batches[0]["xyz"]).all()

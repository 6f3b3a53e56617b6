import numpy as np
import pytest

from implicit_depth_tpu.data import augmentation as aug
from implicit_depth_tpu.data.datasets import MixedDataset, SyntheticDataset, get_dataset
from implicit_depth_tpu.data.exr import exr_loader, read_exr, write_exr
from implicit_depth_tpu.data.loader import DataLoader, collate
from implicit_depth_tpu.train.metrics import (
    AverageValueMeter,
    MeterBank,
    cleargrasp_metrics,
)


def test_exr_roundtrip_zip(tmp_path, rng):
    img = rng.normal(size=(37, 53)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, {"R": img}, compression=3)  # ZIP (16-line blocks)
    out = read_exr(path)
    np.testing.assert_allclose(out["R"], img, rtol=1e-6)
    assert exr_loader(path, 1).shape == (37, 53)


def test_exr_roundtrip_zips_and_none(tmp_path, rng):
    img = rng.normal(size=(8, 16)).astype(np.float32)
    for comp in (0, 2):  # NONE, ZIPS
        path = str(tmp_path / f"t{comp}.exr")
        write_exr(path, {"R": img}, compression=comp)
        np.testing.assert_allclose(read_exr(path)["R"], img, rtol=1e-6)


def test_exr_rgb(tmp_path, rng):
    chans = {c: rng.normal(size=(9, 11)).astype(np.float32) for c in "RGB"}
    path = str(tmp_path / "rgb.exr")
    write_exr(path, chans)
    out = exr_loader(path, 3)
    assert out.shape == (3, 9, 11)
    np.testing.assert_allclose(out[0], chans["R"], rtol=1e-6)


def test_augmentation_shapes(rng):
    params = {"ellipse_dropout_mean": 5, "ellipse_gamma_shape": 10.0,
              "ellipse_gamma_scale": 1.0, "gamma_shape": 1000.0,
              "gamma_scale": 0.001, "gaussian_scale": 0.005,
              "gp_rescale_factor": 4}
    bgr = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    assert aug.chromatic_transform(bgr, rng).shape == bgr.shape
    assert aug.add_noise(bgr, rng).dtype == np.uint8

    vm = np.ones((48, 64), np.float32)
    out = aug.dropout_random_ellipses_4mask(vm, params, rng)
    assert out.shape == vm.shape and out.max() <= 1
    cm = np.zeros((48, 64), np.float32)
    out2 = aug.dropout_random_ellipses_4corruptmask(cm, params, rng)
    assert out2.sum() >= cm.sum()  # only adds

    depth = rng.uniform(0.5, 2, (48, 64)).astype(np.float32)
    d2 = aug.add_noise_to_depth(depth, params, rng)
    np.testing.assert_allclose(d2 / depth, (d2 / depth)[0, 0], rtol=1e-5)  # single factor
    xyz = rng.normal(size=(48, 64, 3)).astype(np.float32)
    x2 = aug.add_noise_to_xyz(xyz, depth, params, rng)
    assert x2.shape == xyz.shape and not np.allclose(x2, xyz)


def test_synthetic_dataset_and_loader():
    params = {"img_height": 48, "img_width": 64, "synthetic_len": 10}
    ds = SyntheticDataset(10, params)
    s = ds[0]
    assert s["rgb"].shape == (48, 64, 3)
    assert s["xyz"].shape == (48, 64, 3)

    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    assert dl.steps_per_epoch() == 2
    batches = list(dl.epoch(0))
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (4, 48, 64, 3)
    assert batches[0]["fx"].shape == (4,)
    # deterministic across re-iteration
    again = list(dl.epoch(0))
    np.testing.assert_allclose(batches[0]["xyz"], again[0]["xyz"])
    # different epoch shuffles differently
    other = list(dl.epoch(1))
    assert not np.allclose(batches[0]["xyz"], other[0]["xyz"])


def test_loader_host_sharding():
    params = {"img_height": 48, "img_width": 64}
    ds = SyntheticDataset(16, params)
    shards = []
    for host in range(2):
        dl = DataLoader(ds, batch_size=4, shuffle=False, host_id=host, num_hosts=2)
        assert dl.steps_per_epoch() == 2
        shards.append([b["item_path"] for b in dl.epoch(0)])
    flat0 = [p for b in shards[0] for p in b]
    flat1 = [p for b in shards[1] for p in b]
    assert not set(flat0) & set(flat1)  # disjoint
    assert len(flat0) + len(flat1) == 16


def test_mixed_dataset_routing():
    params = {"img_height": 48, "img_width": 64}
    a, b = SyntheticDataset(3, params, base_seed=0), SyntheticDataset(2, params, base_seed=100)
    m = MixedDataset([a, b])
    assert len(m) == 5
    np.testing.assert_allclose(m[0]["xyz"], a[0]["xyz"])
    np.testing.assert_allclose(m[4]["xyz"], b[1]["xyz"])


def test_cleargrasp_metrics_protocol(rng):
    gt = rng.uniform(0.5, 2.0, (240, 320)).astype(np.float32)
    m = cleargrasp_metrics(gt, gt, np.ones_like(gt))
    assert m["rmse"] == 0 and m["a1"] == 1.0
    pred = gt * 1.06
    m2 = cleargrasp_metrics(pred, gt, np.ones_like(gt))
    assert m2["a1"] < 0.01 and m2["a2"] > 0.99  # 6% off: fails δ1.05, passes δ1.10
    assert m2["mae"] > 0
    # empty mask -> None
    assert cleargrasp_metrics(pred, gt, np.zeros_like(gt)) is None
    # masked region only
    seg = np.zeros_like(gt); seg[:, :160] = 1
    bad = gt.copy(); bad[:, 160:] = 99.0
    m3 = cleargrasp_metrics(bad, gt, seg)
    assert m3["rmse"] < 1e-6  # errors outside the mask are ignored


def test_meters():
    m = AverageValueMeter()
    m.add(1.0); m.add(3.0)
    assert m.mean == 2.0
    bank = MeterBank()
    bank.add({"a": 1.0}); bank.add({"a": 2.0, "b": 5.0})
    assert bank.means() == {"a": 1.5, "b": 5.0}

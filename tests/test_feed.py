"""Packed host->device feed (train/feed.py): round-trip + derive-xyz tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.camera import compute_xyz_np
from implicit_depth_tpu.train.feed import DeviceFeeder, pack_batch, put_batch


def _batch(b=2, h=48, w=64):
    return synthetic_batch(7, b, h, w)


def test_pack_unpack_roundtrip():
    batch = _batch()
    out = put_batch(dict(batch), mesh=None)
    assert set(out) == set(batch)
    for k, v in batch.items():
        got = np.asarray(out[k])
        assert got.shape == v.shape, k
        if k == "rgb":
            # shipped f16: exact to half precision (values are standardized
            # |x|<~3 in the real pipeline; raw synthetic rgb is in [0,1])
            np.testing.assert_allclose(got, v, atol=2e-3)
        elif k.endswith("mask"):
            np.testing.assert_array_equal(got, v)  # {0,1} exact in f16
        elif k in ("depth", "depth_corrupt"):
            # shipped u16 fixed-point: bounded by the per-batch quant step
            step = v.max() / 65535.0
            np.testing.assert_allclose(got, v, atol=step * 0.51)
            np.testing.assert_array_equal(got == 0, v == 0)  # zeros exact
        else:
            np.testing.assert_array_equal(got, v)  # f32 path bit-exact


def test_u16_depth_quantization_properties():
    """u16 depth feed (VERDICT r4 #5): error <= half a quant step (~0.03 mm
    at 4 m), missing-depth zeros preserved EXACTLY, payload shrinks by
    2 bytes/px/key vs f32."""
    from implicit_depth_tpu.train.feed import fuse_bytes, pack_batch

    batch = dict(_batch())
    batch["depth_corrupt"] = batch["depth"] * (batch["depth"] > 1.0)
    f32, f16, u16, spec = pack_batch(batch, derive_xyz=True)
    b, hw = batch["depth"].shape[0], batch["depth"][0].size
    assert u16.shape == (b, 2 * hw)
    # depth keys moved out of the f32 section (only the 4+2 scalar tail left)
    assert f32.shape == (b, 4 + 2)
    out = put_batch(batch, mesh=None, derive_xyz=True)
    for k in ("depth", "depth_corrupt"):
        got, v = np.asarray(out[k]), batch[k]
        np.testing.assert_allclose(got, v, atol=v.max() / 65535 * 0.51)
        np.testing.assert_array_equal(got == 0, v == 0)
    # byte accounting: u16 section is half the f32 bytes it replaced
    total = fuse_bytes(f32, f16, u16).shape[1]
    assert total == f32.shape[1] * 4 + f16.shape[1] * 2 + u16.shape[1] * 2


def test_derive_xyz_on_device():
    batch = _batch()
    out = put_batch(dict(batch), mesh=None, derive_xyz=True)
    for key, dkey in (("xyz", "depth"), ("xyz_corrupt", "depth_corrupt")):
        want = np.stack([
            compute_xyz_np(np.asarray(batch[dkey][i]), batch["fx"][i],
                           batch["fy"][i], batch["cx"][i], batch["cy"][i])
            for i in range(batch[dkey].shape[0])])
        np.testing.assert_allclose(np.asarray(out[key]), want,
                                   rtol=1e-5, atol=1e-5)


def test_pack_payload_skips_xyz_when_derived():
    batch = _batch()
    full, _, _, _ = pack_batch(batch, derive_xyz=False)
    slim, _, _, _ = pack_batch(batch, derive_xyz=True)
    assert slim.shape[1] < full.shape[1]
    # 2x (H,W,3) xyz keys dropped from the f32 payload
    hw3 = batch["xyz"][0].size
    assert full.shape[1] - slim.shape[1] == 2 * hw3


def test_put_batch_sharded_on_mesh():
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("data",))
    batch = _batch(b=2)
    out = put_batch(dict(batch), mesh=mesh, axis="data")
    np.testing.assert_allclose(np.asarray(out["depth"]), batch["depth"],
                               atol=batch["depth"].max() / 65535 * 0.51)
    assert len(out["depth"].sharding.device_set) == 2


def test_put_batch_passthrough_nonarray():
    batch = dict(_batch())
    batch["item_path"] = ["a", "b"]
    out = put_batch(batch, mesh=None)
    assert out["item_path"] == ["a", "b"]


class _ListLoader:
    def __init__(self, batches):
        self._batches = batches
        self.dataset = None

    def epoch(self, epoch):
        return iter(self._batches)


def test_device_feeder_yields_all_batches():
    batches = [_batch(b=1) for _ in range(4)]
    feeder = DeviceFeeder(_ListLoader(batches), mesh=None, axis=None)
    got = list(feeder.epoch(0))
    assert len(got) == 4
    np.testing.assert_allclose(np.asarray(got[2]["depth"]),
                               batches[2]["depth"],
                               atol=batches[2]["depth"].max() / 65535 * 0.51)


def test_device_feeder_propagates_errors():
    def bad_epoch():
        yield _batch(b=1)
        raise RuntimeError("loader exploded")

    class BadLoader(_ListLoader):
        def epoch(self, epoch):
            return bad_epoch()

    feeder = DeviceFeeder(BadLoader([]), mesh=None, axis=None)
    it = feeder.epoch(0)
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(it)

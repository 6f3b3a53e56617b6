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
        else:
            np.testing.assert_array_equal(got, v)  # f32 path bit-exact


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
    full, _, _ = pack_batch(batch, derive_xyz=False)
    slim, _, _ = pack_batch(batch, derive_xyz=True)
    assert slim.shape[1] < full.shape[1]
    # 2x (H,W,3) xyz keys dropped from the f32 payload
    hw3 = batch["xyz"][0].size
    assert full.shape[1] - slim.shape[1] == 2 * hw3


def test_put_batch_sharded_on_mesh():
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("data",))
    batch = _batch(b=2)
    out = put_batch(dict(batch), mesh=mesh, axis="data")
    np.testing.assert_array_equal(np.asarray(out["depth"]), batch["depth"])
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
    np.testing.assert_array_equal(np.asarray(got[2]["depth"]),
                                  batches[2]["depth"])


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

"""Determinism: same seed ⇒ identical sampling, training step, and loader
order (the reference's determinism switch, main.py:26-32, is a global seed;
here every random choice is keyed)."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.datasets import SyntheticDataset
from implicit_depth_tpu.data.loader import DataLoader
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs

H, W = 48, 64


def test_prepare_deterministic():
    raw = synthetic_batch(0, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    f = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))
    a = f(batch, jax.random.key(7))
    b = f(batch, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a["miss_idx"]), np.asarray(b["miss_idx"]))
    np.testing.assert_array_equal(np.asarray(a["pair_cell"]), np.asarray(b["pair_cell"]))
    c = f(batch, jax.random.key(8))
    assert not np.array_equal(np.asarray(a["miss_idx"]), np.asarray(c["miss_idx"]))


def test_model_apply_deterministic():
    raw = synthetic_batch(0, 1, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    v = jax.jit(lambda k, i: model.init(k, i, train=False, use_gt_label=True))(
        jax.random.key(1), inp)
    f = jax.jit(lambda vv, i: model.apply(vv, i, train=False, use_gt_label=True))
    o1, o2 = f(v, inp), f(v, inp)
    np.testing.assert_array_equal(np.asarray(o1["pred_pos"]), np.asarray(o2["pred_pos"]))


def test_loader_epoch_deterministic():
    ds = SyntheticDataset(8, {"img_height": H, "img_width": W})
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=2)
    a = [b["item_path"] for b in dl.epoch(5)]
    b = [b["item_path"] for b in dl.epoch(5)]
    assert a == b

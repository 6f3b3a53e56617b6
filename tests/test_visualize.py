import os

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import LIDFStatic, prepare_inputs
from implicit_depth_tpu.train.visualize import dump_batch_visuals
from implicit_depth_tpu.utils.ply import load_point_cloud, save_point_cloud


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    save_point_cloud(p, xyz, rgb)
    x2, c2 = load_point_cloud(p)
    np.testing.assert_allclose(x2, xyz)
    assert c2.dtype == np.uint8 and c2.shape == (100, 3)
    save_point_cloud(str(tmp_path / "b.ply"), xyz)
    x3, c3 = load_point_cloud(str(tmp_path / "b.ply"))
    np.testing.assert_allclose(x3, xyz)
    assert c3 is None


def test_dump_batch_visuals(tmp_path):
    h, w = 48, 64
    raw = synthetic_batch(0, 1, h, w)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    pred = np.asarray(inputs["gt_pos"])  # any (B,R,3) positions
    dump_batch_visuals(str(tmp_path), "t", batch, inputs, pred)
    files = sorted(os.listdir(tmp_path))
    assert "t_panel.png" in files
    for suffix in ("inp", "gt", "pred", "pred_transparent"):
        assert f"t_{suffix}.ply" in files
        xyz, rgb = load_point_cloud(str(tmp_path / f"t_{suffix}.ply"))
        assert np.isfinite(xyz).all()

"""DepthCompleter serving API: checkpoint load -> complete() end-to-end.

Covers the reference's user-facing inference workflow (exp_type: test,
train_refine.py:625-664) as a library call, tiny shapes on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.infer import DepthCompleter
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.train.checkpoint import Checkpointer
from implicit_depth_tpu.train.state import TrainState, make_tx

H, W = 48, 64


def tiny_cfg():
    return load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8,
                  "resnet_stages": [1, 1, 1, 1]},
        "refine": {"pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"res": 8, "miss_sample_num": 256, "valid_sample_num": 512},
        "tpu": {"max_pairs_per_ray": 8},
    })


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    """Random-init LIDF + refine states saved through the real Checkpointer."""
    cfg = tiny_cfg()
    static = build_static(cfg, n_rays=H * W)
    lidf = build_lidf(cfg, static)
    refine = build_refine(cfg, static)

    raw = synthetic_batch(3, 1, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, k: prepare_inputs(
        static, b, k, train=False, mask_type="all"))(batch, jax.random.key(0))
    lvars = jax.jit(lambda k, i: lidf.init(
        k, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    lout = jax.jit(lambda v, i: lidf.apply(
        v, i, train=False, use_gt_label=False))(lvars, inputs)
    rvars = jax.jit(lambda k, i, o: refine.init(
        k, i, o, o["pred_pos"]))(jax.random.key(2), inputs, lout)

    tx = make_tx(cfg.training, 10)
    base = tmp_path_factory.mktemp("infer_ckpts")
    ldir, rdir = str(base / "lidf"), str(base / "refine")
    Checkpointer(ldir).save(
        TrainState.create(lvars["params"], lvars["batch_stats"], tx), 0)
    Checkpointer(rdir).save(TrainState.create(rvars["params"], {}, tx), 0)
    return cfg, ldir, rdir


def _frame(seed=5):
    raw = synthetic_batch(seed, 1, H, W)
    depth = np.asarray(raw["depth_corrupt"][0])
    rgb = np.random.default_rng(seed).integers(
        0, 255, (H, W, 3), dtype=np.uint8)
    return rgb, depth, (80.0, 80.0, W / 2, H / 2)


def test_complete_stage1_only(ckpt_dirs):
    cfg, ldir, _ = ckpt_dirs
    dc = DepthCompleter.from_checkpoint(ldir, cfg=cfg)
    rgb, depth, intr = _frame()
    assert (depth == 0).any() and (depth != 0).any()
    out = dc.complete(rgb, depth, intr)
    assert out["depth"].shape == (H, W)
    assert out["depth_pred"].shape == (H, W)
    assert np.isfinite(out["depth"]).all()
    # input depth preserved where present; prediction filled where missing
    np.testing.assert_array_equal(out["depth"][depth != 0], depth[depth != 0])
    assert (out["depth"][depth == 0] == out["depth_pred"][depth == 0]).all()


def test_complete_two_stage_batch_and_resize(ckpt_dirs):
    cfg, ldir, rdir = ckpt_dirs
    dc = DepthCompleter.from_checkpoint(ldir, refine_ckpt_dir=rdir, cfg=cfg,
                                        batch_size=2)
    assert dc.refine is not None
    rgb, depth, intr = _frame(7)
    # frame at 2x the model resolution exercises the resize path
    rgb2 = np.repeat(np.repeat(rgb, 2, axis=0), 2, axis=1)
    depth2 = np.repeat(np.repeat(depth, 2, axis=0), 2, axis=1)
    intr2 = (intr[0] * 2, intr[1] * 2, intr[2] * 2, intr[3] * 2)
    out = dc.complete_batch([rgb, rgb], [depth, depth], [intr, intr])
    assert out["depth"].shape == (2, H, W)
    # same frame twice -> same completion (batched conv reductions carry
    # ~1e-6 float noise across batch rows; anything beyond that is a bug)
    np.testing.assert_allclose(out["depth"][0], out["depth"][1], atol=1e-5)
    out2 = dc.complete(rgb2, depth2, intr2)
    assert out2["depth"].shape == (2 * H, 2 * W)
    np.testing.assert_array_equal(out2["depth"][depth2 != 0],
                                  depth2[depth2 != 0])
    with pytest.raises(ValueError):
        dc.complete_batch([rgb] * 3, [depth] * 3, [intr] * 3)


def test_complete_depth_cli(ckpt_dirs, tmp_path):
    """scripts/complete_depth.py: files in -> completed depth file out."""
    import importlib.util

    import cv2

    cfg, ldir, _ = ckpt_dirs
    spec = importlib.util.spec_from_file_location(
        "complete_depth", "scripts/complete_depth.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rgb, depth, intr = _frame(9)
    rgb_p, dep_p = str(tmp_path / "f-rgb.png"), str(tmp_path / "f-depth.npy")
    out_p = str(tmp_path / "completed.npy")
    cv2.imwrite(rgb_p, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    np.save(dep_p, depth)
    cfg_p = str(tmp_path / "cfg.yaml")
    cfg.save(cfg_p)
    mod.main(["--lidf_ckpt", ldir, "--cfg_paths", cfg_p,
              "--rgb", rgb_p, "--depth", dep_p, "--out", out_p,
              "--fx", str(intr[0]), "--fy", str(intr[1]),
              "--cx", str(intr[2]), "--cy", str(intr[3])])
    done = np.load(out_p)
    assert done.shape == depth.shape
    np.testing.assert_array_equal(done[depth != 0], depth[depth != 0])
    assert np.isfinite(done).all()


def test_complete_mesh_matches_single_device(ckpt_dirs):
    """Multi-chip serving: an 8-device (data x rays) mesh — 2 frames on the
    data axis, rays split 4-way — completes to the same depths as the
    single-device path."""
    cfg, ldir, _ = ckpt_dirs
    dc1 = DepthCompleter.from_checkpoint(ldir, cfg=cfg, batch_size=2)
    dc8 = DepthCompleter.from_checkpoint(ldir, cfg=cfg, batch_size=2,
                                         mesh="auto")
    assert dc8.mesh is not None and dc8.mesh.devices.size == 8
    rgb, depth, intr = _frame(11)
    rgb2, depth2, intr2 = _frame(13)
    out1 = dc1.complete_batch([rgb, rgb2], [depth, depth2], [intr, intr2])
    out8 = dc8.complete_batch([rgb, rgb2], [depth, depth2], [intr, intr2])
    np.testing.assert_allclose(out8["depth"], out1["depth"], atol=1e-5)

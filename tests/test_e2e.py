"""End-to-end: prepare -> LIDF forward -> loss -> grads -> refine, tiny shapes.

Everything is wrapped in jax.jit — eager execution of the full pipeline does
hundreds of per-op CPU compiles and takes minutes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import (
    LIDFModel,
    LIDFStatic,
    lidf_loss,
    prepare_inputs,
)
from implicit_depth_tpu.models.refine import RefineModel, refine_loss
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import (
    make_lidf_eval_step,
    make_lidf_train_step,
    make_refine_train_step,
)

H, W = 48, 64
N_VALID, N_RAYS, K = 512, 256, 8


def tiny_cfg():
    return load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "refine": {"pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"res": 8, "miss_sample_num": N_RAYS, "valid_sample_num": N_VALID},
        "tpu": {"max_pairs_per_ray": K},
        "loss": {"hard_neg_ratio": 0.1},
    })


def tiny_models(cfg, n_rays=None):
    static = LIDFStatic(grid=make_voxel_grid(cfg.grid.res),
                        n_valid=cfg.grid.valid_sample_num,
                        n_rays=n_rays or cfg.grid.miss_sample_num,
                        k_pairs=cfg.tpu.max_pairs_per_ray)
    lidf = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                     imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    refine = RefineModel(static=static, pnet_out=16, pnet_gf=8, imnet_gf=8)
    return static, lidf, refine


@pytest.fixture(scope="module")
def batch():
    b = synthetic_batch(0, 2, H, W)
    return {k: jnp.asarray(v) for k, v in b.items()}


@functools.lru_cache(maxsize=4)
def _prepared(n_rays=None, train=True):
    cfg = tiny_cfg()
    static, lidf, refine = tiny_models(cfg, n_rays)
    return cfg, static, lidf, refine


def _prep(static, batch, train=True):
    f = jax.jit(lambda bt, k: prepare_inputs(static, bt, k, train=train))
    return f(batch, jax.random.key(0))


@pytest.fixture(scope="module")
def stage1(batch):
    """Shared prepared inputs + initialized LIDF variables + outputs."""
    cfg, static, lidf, refine = _prepared()
    inp = _prep(static, batch)
    variables = jax.jit(
        lambda k, i: lidf.init(k, i, train=False, use_gt_label=True)
    )(jax.random.key(1), inp)
    out = jax.jit(
        lambda v, i: lidf.apply(v, i, train=False, use_gt_label=True)
    )(variables, inp)
    return cfg, static, lidf, refine, inp, variables, out


def test_prepare_inputs_shapes_and_labels(stage1):
    cfg, static, _, _, inp, _, _ = stage1
    r, k = static.n_rays, static.k_pairs
    assert inp["miss_dir"].shape == (2, r, 3)
    assert inp["pair_valid"].shape == (2, r, k)
    assert inp["pair_label"].shape == (2, r, k)
    assert np.asarray(inp["miss_slot"]).sum() > 100
    assert np.asarray(inp["pair_valid"]).sum() > 100
    # GT labels exist only when the gt point's cell is occupied — sparse on a
    # tiny synthetic scene, but must be present and consistent
    lab = np.asarray(inp["pair_label"])
    assert lab.sum() > 0
    assert not np.any(lab & ~np.asarray(inp["pair_valid"]))
    # every labeled pair brackets the gt point along the ray
    gt = np.asarray(inp["gt_pos"])
    t_en = np.asarray(inp["t_enter"]); t_ex = np.asarray(inp["t_exit"])
    bi, ri, ki = np.nonzero(lab)
    gt_t = np.linalg.norm(gt[bi, ri], axis=-1)
    part_diag = static.grid.part_size * np.sqrt(3)
    assert np.all(gt_t >= t_en[bi, ri, ki] - part_diag)
    assert np.all(gt_t <= t_ex[bi, ri, ki] + part_diag)


def test_compose_pred_image_matches_scatter(stage1, batch):
    """The gather-only loss-path image write (compose_pred_image) must equal
    the scatter form exactly — values AND cotangents — for both the
    window-sampled train rays and the pixel-aligned eval rays."""
    from implicit_depth_tpu.models.lidf import (
        compose_pred_image,
        scatter_into_image,
    )

    cfg, static, _, _, _, _, _ = stage1
    for train in (True, False):
        inp = _prep(static, batch, train=train)
        base = inp["xyz_corrupt_flat"]
        values = inp["gt_pos"] * 1.7 + 0.1  # arbitrary, differs from base

        ref = jax.jit(lambda v: scatter_into_image(
            base, inp["miss_idx"], inp["miss_slot"], v))
        new = jax.jit(lambda v: compose_pred_image(base, v, inp, train))
        np.testing.assert_array_equal(np.asarray(ref(values)),
                                      np.asarray(new(values)))

        g_ref = jax.jit(jax.grad(lambda v: (ref(v) ** 2).sum()))(values)
        g_new = jax.jit(jax.grad(lambda v: (new(v) ** 2).sum()))(values)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_new))

        gb_ref = jax.jit(jax.grad(lambda bb: (scatter_into_image(
            bb, inp["miss_idx"], inp["miss_slot"], values) ** 2).sum()))(base)
        gb_new = jax.jit(jax.grad(lambda bb: (compose_pred_image(
            bb, values, inp, train) ** 2).sum()))(base)
        np.testing.assert_array_equal(np.asarray(gb_ref), np.asarray(gb_new))


def test_lidf_forward_loss_grads(stage1):
    cfg, static, lidf, _, inp, variables, out = stage1
    r, k = static.n_rays, static.k_pairs
    assert out["pred_pos"].shape == (2, r, 3)
    assert out["prob_logit"].shape == (2, r, k)

    losses = jax.jit(lambda i, o: lidf_loss(i, o, train=True, img_hw=(H, W)))(inp, out)
    for key, v in losses.items():
        assert np.isfinite(np.asarray(v)), key
    assert float(losses["loss_net"]) > 0

    def scalar_loss(params):
        o = lidf.apply({"params": params, "batch_stats": variables["batch_stats"]},
                       inp, train=False, use_gt_label=True)
        return lidf_loss(inp, o, train=True, img_hw=(H, W))["loss_net"]

    grads = jax.jit(jax.grad(scalar_loss))(variables["params"])
    norms = jax.tree.map(lambda g: float(jnp.abs(g).max()), grads)
    flat = jax.tree.leaves(norms)
    assert all(np.isfinite(v) for v in flat)
    assert sum(v > 0 for v in flat) > len(flat) * 0.5  # most params get grads


def test_train_step_updates(stage1, batch):
    cfg, static, lidf, _, inp, variables, _ = stage1
    tx = make_tx(cfg.training, steps_per_epoch=10)
    # the train step DONATES the state: give it private copies and snapshot
    # the originals as numpy before stepping
    params0 = jax.tree.map(np.asarray, variables["params"])
    state = TrainState.create(jax.tree.map(jnp.array, variables["params"]),
                              jax.tree.map(jnp.array, variables["batch_stats"]),
                              tx)
    step = make_lidf_train_step(cfg, lidf)
    state2, losses = step(state, batch, jax.random.key(2), jnp.asarray(0))
    assert state2.step == 1
    assert np.isfinite(float(losses["loss_net"]))
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                        state2.params, params0)
    assert max(jax.tree.leaves(diff)) > 0
    # second step reuses the compiled fn, different epoch value
    state3, losses3 = step(state2, batch, jax.random.key(3), jnp.asarray(7))
    assert np.isfinite(float(losses3["loss_net"]))


def test_eval_step_all_pixels(stage1, batch):
    cfg, _, _, _, _, variables, _ = stage1
    _, _, lidf_eval, _ = _prepared(n_rays=H * W)
    tx = make_tx(cfg.training, steps_per_epoch=10)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    eval_step = make_lidf_eval_step(cfg, lidf_eval)
    inputs, out, losses = eval_step(state, batch, jax.random.key(2))
    assert inputs["miss_dir"].shape == (2, H * W, 3)
    assert np.isfinite(float(losses["loss_net"]))
    # 'all' mask: every pixel is a ray slot
    assert np.asarray(inputs["miss_slot"]).all()


def test_refine_step(stage1, batch):
    cfg, static, lidf, refine, inp, lidf_vars, lidf_out = stage1
    rvars = jax.jit(
        lambda k, i, o: refine.init(k, i, o, o["pred_pos"])
    )(jax.random.key(2), inp, lidf_out)
    pred = jax.jit(
        lambda v, i, o: refine.apply(v, i, o, o["pred_pos"])
    )(rvars, inp, lidf_out)
    assert pred.shape == lidf_out["pred_pos"].shape
    # refinement moves points by at most the offset range
    delta = np.linalg.norm(np.asarray(pred - lidf_out["pred_pos"]), axis=-1)
    assert delta.max() <= 0.2 + 1e-4

    losses = jax.jit(lambda i, p: refine_loss(i, p, train=True, img_hw=(H, W)))(inp, pred)
    assert np.isfinite(float(losses["loss_net"]))

    tx = make_tx(cfg.training, steps_per_epoch=10)
    params0 = jax.tree.map(np.asarray, rvars["params"])
    state = TrainState.create(jax.tree.map(jnp.array, rvars["params"]), {}, tx)
    rstep = make_refine_train_step(cfg, lidf, refine)
    state2, rlosses = rstep(state, lidf_vars, batch, jax.random.key(3), jnp.asarray(0))
    assert np.isfinite(float(rlosses["loss_net"]))
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                        state2.params, params0)
    assert max(jax.tree.leaves(diff)) > 0


def test_surf_smooth_planar_matches_nhwc(stage1, batch):
    """The planar (B,3,H,W) surf-norm branch ≡ the NHWC slot-gather form on
    real prepare_inputs outputs — train and eval, plain and hard-neg. The
    NHWC reference path is selected by dropping the window keys (the
    hand-built-inputs fallback)."""
    from implicit_depth_tpu.models.lidf import surf_smooth_terms

    cfg, static, lidf, refine, inp, variables, out = stage1

    for train in (True, False):
        inputs = inp if train else _prep(static, batch, train=False)
        key = jax.random.key(7)
        pred = inputs["gt_pos"] + 0.02 * jax.random.normal(
            key, inputs["gt_pos"].shape)
        nhwc_inputs = {k: v for k, v in inputs.items()
                       if k not in ("miss_mask_flat", "miss_start")}
        for hard_neg in (False, True):
            f = jax.jit(functools.partial(
                surf_smooth_terms, train=train, img_hw=(H, W),
                hard_neg=hard_neg, hard_neg_ratio=0.1, want_smooth=True))
            s_pl, a_pl, m_pl = f(inputs, pred)
            s_nh, a_nh, m_nh = f(nhwc_inputs, pred)
            np.testing.assert_allclose(s_pl, s_nh, rtol=2e-5, atol=1e-7)
            np.testing.assert_allclose(a_pl, a_nh, rtol=2e-5, atol=2e-4)
            np.testing.assert_allclose(m_pl, m_nh, rtol=2e-5, atol=1e-7)

"""Compacted pair decode must equal the dense decode for kept pairs."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs

H, W = 48, 64


def _setup(pairs_budget, mode="global"):
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=512, n_rays=256, k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1),
                      pairs_budget=pairs_budget, pairs_budget_mode=mode)
    return static, model


def test_compacted_equals_dense():
    raw = synthetic_batch(0, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static, dense = _setup(0)
    _, comp = _setup(8, "global")  # budget >= K: nothing dropped

    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: dense.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)

    out_d = jax.jit(lambda v, i: dense.apply(v, i, train=False,
                                             use_gt_label=True))(variables, inp)
    out_c = jax.jit(lambda v, i: comp.apply(v, i, train=False,
                                            use_gt_label=True))(variables, inp)

    valid = np.asarray(inp["pair_valid"])
    for key in ("prob_logit", "prob_softmax"):
        a, b_ = np.asarray(out_d[key]), np.asarray(out_c[key])
        np.testing.assert_allclose(a[valid], b_[valid], atol=1e-5, err_msg=key)
    np.testing.assert_allclose(np.asarray(out_d["pred_pos"]),
                               np.asarray(out_c["pred_pos"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_d["max_slot"]),
                                  np.asarray(out_c["max_slot"]))


def test_per_ray_truncation_equals_dense_on_kept_slots():
    """pairs_budget_mode='per_ray' (models/lidf.py): the first `budget`
    t-sorted slots decode identically to the dense path; later slots are
    removed from every per-ray competition."""
    raw = synthetic_batch(2, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static, dense = _setup(0)
    _, trunc = _setup(4, "per_ray")

    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: dense.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    out_d = jax.jit(lambda v, i: dense.apply(v, i, train=False,
                                             use_gt_label=True))(variables, inp)
    out_t = jax.jit(lambda v, i: trunc.apply(v, i, train=False,
                                             use_gt_label=True))(variables, inp)

    valid = np.asarray(inp["pair_valid"])
    kept = valid[:, :, :4]
    # per-ray budget outputs carry ONLY the kept slots (B, R, budget)
    assert out_t["prob_logit"].shape[-1] == 4
    np.testing.assert_allclose(np.asarray(out_t["prob_logit"])[kept],
                               np.asarray(out_d["prob_logit"])[:, :, :4][kept],
                               atol=1e-5)
    # rays whose pairs all sit in the kept slots predict identically
    unaffected = ~valid[:, :, 4:].any(-1)
    np.testing.assert_allclose(np.asarray(out_t["pred_pos"])[unaffected],
                               np.asarray(out_d["pred_pos"])[unaffected],
                               atol=1e-5)


def test_budget_overflow_drops_far_pairs_only():
    raw = synthetic_batch(1, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static, comp = _setup(1, "global")  # tiny budget: 1 pair/ray avg -> overflow

    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: comp.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    out = jax.jit(lambda v, i: comp.apply(v, i, train=False,
                                          use_gt_label=True))(variables, inp)
    # decoded (nonzero) logits must be concentrated at low-k slots
    logit = np.asarray(out["prob_logit"])
    valid = np.asarray(inp["pair_valid"])
    decoded = (logit != 0) & valid
    if decoded.any():
        # every decoded slot index must be <= any dropped (valid, zero) slot
        kmax_decoded = np.max(np.nonzero(decoded)[-1])
        dropped = valid & ~decoded
        if dropped.any():
            kmin_dropped = np.min(np.nonzero(dropped)[-1])
            assert kmax_decoded <= kmin_dropped + 1
    assert np.isfinite(np.asarray(out["pred_pos"])).all()

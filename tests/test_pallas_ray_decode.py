"""Ray-major fused decode: kernel ≡ XLA oracle ≡ the original pair decode.

Kernel I/O layout: narrow per-pair operands (positions, cell ids,
cotangents) cross the custom-call boundary ray-major lane-packed
((N, kb·c) — see ops/pallas_ray_decode.pack_pair_pos) and the outputs are
(N, kb); the oracle keeps flat (N·kb, c) rows. Tests convert between the
two with free reshapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.ops.pallas_decode import xla_pair_decode
from implicit_depth_tpu.ops.pallas_ray_decode import (
    fused_ray_decode,
    xla_ray_decode,
)

N_RAYS, KB, CV, GF4 = 96, 8, 32, 64


def _rk(pos6, n_rays=None):
    """(N·kb, 6) oracle rows -> (N, kb·6) ray-major packed kernel operand."""
    n = pos6.shape[0] // KB if n_rays is None else n_rays
    return pos6.reshape(n, KB * 6)


def _flat(out):
    """(N, kb) kernel output -> (N·kb,) oracle rows."""
    return out.reshape(-1)


def _weights(rng, c_embed):
    dims = [(c_embed + 16, GF4), (GF4, GF4 // 2), (GF4 // 2, GF4 // 4),
            (GF4 // 4, 1)]
    w = {"off_enc_w": rng.normal(size=(1, 16)).astype(np.float32),
         "off_enc_b": rng.normal(size=(16,)).astype(np.float32)}
    for i, (a, b) in enumerate(dims, 1):
        w[f"off_w{i}"] = (rng.normal(size=(a, b)) * 0.2).astype(np.float32)
        w[f"off_b{i}"] = (rng.normal(size=(b,)) * 0.1).astype(np.float32)
        ap = a if i > 1 else c_embed
        w[f"prob_w{i}"] = (rng.normal(size=(ap, b)) * 0.2).astype(np.float32)
        w[f"prob_b{i}"] = (rng.normal(size=(b,)) * 0.1).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in w.items()}


@pytest.fixture(scope="module")
def data(rng_module=None):
    rng = np.random.default_rng(11)
    c_embed = CV + 128 + 102 + 27
    pair_vox = rng.normal(size=(N_RAYS * KB, CV)).astype(np.float32)
    pos = (rng.normal(size=(N_RAYS * KB, 6)) * 0.5).astype(np.float32)
    ray_feat = rng.normal(size=(N_RAYS, 128 + 27)).astype(np.float32)
    return (jnp.asarray(pair_vox), jnp.asarray(pos), jnp.asarray(ray_feat),
            _weights(rng, c_embed))


def test_xla_ray_decode_matches_pair_decode(data):
    """The split-layer-1 ray-major math is a reassociation of the original
    flat (P, 385) decode: same offsets/logits."""
    pair_vox, pos, ray_feat, w = data
    roi = jnp.repeat(ray_feat[:, :128], KB, axis=0)
    dir_e = jnp.repeat(ray_feat[:, 128:], KB, axis=0)
    want_off, want_logit = xla_pair_decode(
        pair_vox, roi, pos[:, 0:3], pos[:, 3:6], dir_e, w,
        multires=8, n_iter=2, dtype=jnp.float32)
    got_off, got_logit = xla_ray_decode(
        pair_vox, pos, ray_feat, w, kb=KB, multires=8, n_iter=2,
        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want_off),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_logit), np.asarray(want_logit),
                               atol=2e-5)


def test_kernel_matches_xla_oracle(data):
    pair_vox, pos, ray_feat, w = data
    want = xla_ray_decode(pair_vox, pos, ray_feat, w, kb=KB,
                          dtype=jnp.float32)
    got = fused_ray_decode(pair_vox, _rk(pos), ray_feat, w, KB, 8, 2, 0.001,
                           False, jnp.float32, 32, True)  # interpret mode
    for g, t in zip(got, want):
        np.testing.assert_allclose(_flat(np.asarray(g)), np.asarray(t),
                                   atol=2e-5)


def test_kernel_pads_ragged_tiles(data):
    pair_vox, pos, ray_feat, w = data
    n = 70 * KB  # 70 rays, not a multiple of the 32-ray tile
    want = xla_ray_decode(pair_vox[:n], pos[:n], ray_feat[:70], w, kb=KB,
                          dtype=jnp.float32)
    got = fused_ray_decode(pair_vox[:n], _rk(pos[:n], 70), ray_feat[:70], w,
                           KB, 8, 2, 0.001, False, jnp.float32, 32, True)
    for g, t in zip(got, want):
        assert _flat(g).shape == t.shape
        np.testing.assert_allclose(_flat(np.asarray(g)), np.asarray(t),
                                   atol=2e-5)


def test_model_ray_major_kernel_matches_dense():
    """LIDFModel with use_pallas_decode + per_ray budget must reproduce the
    plain dense decode on the kept slots (interpret mode on CPU)."""
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs

    H, W = 48, 64
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=512, n_rays=256,
                        k_pairs=8)
    mk = lambda pallas: LIDFModel(
        static=static, rgb_out=8, pnet_out=16, pnet_gf=8, imnet_gf=8,
        resnet_stages=(1, 1, 1, 1), pairs_budget=4,
        pairs_budget_mode="per_ray", use_pallas_decode=pallas)
    plain, fused = mk(False), mk(True)

    raw = synthetic_batch(3, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: plain.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    out_a = jax.jit(lambda v, i: plain.apply(v, i, train=False,
                                             use_gt_label=True))(variables, inp)
    out_b = jax.jit(lambda v, i: fused.apply(v, i, train=False,
                                             use_gt_label=True))(variables, inp)
    kept = np.asarray(out_a["pair_valid"])
    np.testing.assert_allclose(np.asarray(out_b["prob_logit"])[kept],
                               np.asarray(out_a["prob_logit"])[kept],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_b["pred_pos"]),
                               np.asarray(out_a["pred_pos"]), atol=2e-5)


def test_pack_pair_pos_layout():
    """pack_pair_pos column j·6+d == slot j's [enter|leave][d]."""
    from implicit_depth_tpu.ops.pallas_ray_decode import pack_pair_pos

    rng = np.random.default_rng(3)
    enter = rng.normal(size=(5, KB, 3)).astype(np.float32)
    leave = rng.normal(size=(5, KB, 3)).astype(np.float32)
    packed = np.asarray(pack_pair_pos(jnp.asarray(enter), jnp.asarray(leave)))
    assert packed.shape == (5, KB * 6)
    for j in range(KB):
        np.testing.assert_array_equal(packed[:, j * 6:j * 6 + 3], enter[:, j])
        np.testing.assert_array_equal(packed[:, j * 6 + 3:j * 6 + 6], leave[:, j])


def test_onehot_variant_matches_gathered(data):
    """In-kernel one-hot voxel lookup ≡ feeding pre-gathered rows."""
    from implicit_depth_tpu.ops.pallas_ray_decode import fused_ray_decode_onehot

    _, pos, ray_feat, w = data
    rng = np.random.default_rng(5)
    n_cells = 272  # lane-unaligned on purpose
    table = jnp.asarray(rng.normal(size=(n_cells, CV)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n_cells, N_RAYS * KB, dtype=np.int32))
    want = fused_ray_decode(table[ids], _rk(pos), ray_feat, w, KB, 8, 2,
                            0.001, False, jnp.float32, 32, True)
    got = fused_ray_decode_onehot(ids.reshape(N_RAYS, KB), _rk(pos),
                                  (ray_feat, table), w, KB, 8, 2,
                                  0.001, False, jnp.float32, 32, True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # grads flow to the table (bwd: XLA recompute through the gather)
    def loss(tb):
        off, logit = fused_ray_decode_onehot(ids.reshape(N_RAYS, KB),
                                             _rk(pos), (ray_feat, tb), w, KB,
                                             8, 2, 0.001, False, jnp.float32,
                                             32, True)
        return jnp.sum(off + logit)

    gt = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).sum() > 0


def test_table_variant_matches_gathered(data):
    """Per-image-table kernel (local ids + per-image table blocks) ≡ feeding
    pre-gathered rows, and its fused backward ≡ the XLA fallback backward,
    across 2 images × 3 tiles each."""
    from implicit_depth_tpu.ops.pallas_ray_decode import fused_ray_decode_table

    _, pos, ray_feat, w = data
    rng = np.random.default_rng(7)
    n_cells, n_imgs, t = 272, 2, 16
    rays_per_img = N_RAYS // n_imgs
    tpi = rays_per_img // t
    table = jnp.asarray(rng.normal(size=(n_imgs * n_cells, CV)).astype(np.float32))
    cells = jnp.asarray(rng.integers(0, n_cells, N_RAYS * KB, dtype=np.int32))
    gids = cells + (jnp.arange(N_RAYS * KB, dtype=jnp.int32)
                    // (rays_per_img * KB)) * n_cells
    cells_rk = cells.reshape(N_RAYS, KB)

    want = fused_ray_decode(table[gids], _rk(pos), ray_feat, w, KB, 8, 2,
                            0.001, False, jnp.float32, t, True)
    got = fused_ray_decode_table(cells_rk, _rk(pos), ray_feat, table, w, KB,
                                 tpi, 8, 2, 0.001, False, jnp.float32, t, True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss(impl):
        def f(rf, tb, ws):
            off, logit = fused_ray_decode_table(cells_rk, _rk(pos), rf, tb,
                                                ws, KB, tpi, 8, 2, 0.001,
                                                False, jnp.float32, t, True,
                                                impl)
            return jnp.sum(off * 1.3 + logit * 0.7)
        return jax.grad(f, argnums=(0, 1, 2))(ray_feat, table, w)

    g_xla = jax.tree.leaves(loss("xla"))
    for impl in ("kernel", "kernel_save", "kernel_save_all"):
        for a, b in zip(jax.tree.leaves(loss(impl)), g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-5)


def test_bwd_kernel_grads_match_xla(data):
    """Fused backward kernel (per-tile recompute + VMEM weight-grad
    accumulators) ≡ differentiating the XLA oracle. 96 rays / 32-ray tiles
    exercises multi-tile accumulation; 70 rays exercises padded tiles."""
    pair_vox, pos, ray_feat, w = data

    for n in (N_RAYS, 70):
        pv, po, rf = pair_vox[:n * KB], pos[:n * KB], ray_feat[:n]
        po_rk = _rk(po, n)

        def loss_kernel(pv_, rf_, ws):
            off, logit = fused_ray_decode(pv_, po_rk, rf_, ws, KB, 8, 2,
                                          0.001, False, jnp.float32, 32,
                                          True, "kernel")
            return jnp.sum(off * 1.3 + logit * 0.7)

        def loss_xla(pv_, rf_, ws):
            off, logit = xla_ray_decode(pv_, po, rf_, ws, kb=KB,
                                        dtype=jnp.float32)
            return jnp.sum(off * 1.3 + logit * 0.7)

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(pv, rf, w)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(pv, rf, w)
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=2e-5)


def test_bwd_kernel_sigmoid_squash(data):
    """use_sigmoid=True derivative path in the fused backward."""
    pair_vox, pos, ray_feat, w = data

    def loss(impl):
        def f(ws):
            off, logit = fused_ray_decode(pair_vox, _rk(pos), ray_feat, ws,
                                          KB, 8, 2, 0.001, True, jnp.float32,
                                          32, True, impl)
            return jnp.sum(off - 2 * logit)
        return jax.grad(f)(w)

    for a, b in zip(jax.tree.leaves(loss("kernel")), jax.tree.leaves(loss("xla"))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_custom_vjp_grads_match_xla(data):
    """Backward (XLA recompute) must equal differentiating the oracle."""
    pair_vox, pos, ray_feat, w = data

    def loss_kernel(pv, rf, ws):
        off, logit = fused_ray_decode(pv, _rk(pos), rf, ws, KB, 8, 2, 0.001,
                                      False, jnp.float32, 32, True)
        return jnp.sum(off * 1.3 + logit * 0.7)

    def loss_xla(pv, rf, ws):
        off, logit = xla_ray_decode(pv, pos, rf, ws, kb=KB,
                                    dtype=jnp.float32)
        return jnp.sum(off * 1.3 + logit * 0.7)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(pair_vox, ray_feat, w)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(pair_vox, ray_feat, w)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_serve_table_matches_rows():
    """tpu.decode_serve_table routes the SERVING decode through the
    per-image-table kernel (in-kernel one-hot voxel lookup) instead of
    pre-gathered rows — outputs must match the rows path exactly (the
    one-hot picks a single bf16 element under f32 accumulation). Measured a
    perf wash on v5e (rows 11.3-13.2 ms vs table 12.7-13.0 ms full fwd), so
    rows stays the default; the knob lets other chips re-evaluate."""
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs

    H, W = 48, 64
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=512, n_rays=256,
                        k_pairs=8)
    mk = lambda table: LIDFModel(
        static=static, rgb_out=8, pnet_out=16, pnet_gf=8, imnet_gf=8,
        resnet_stages=(1, 1, 1, 1), pairs_budget=4,
        pairs_budget_mode="per_ray", use_pallas_decode=True,
        decode_rays_per_tile=64, decode_serve_table=table)
    rows_m, table_m = mk(False), mk(True)

    raw = synthetic_batch(5, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: rows_m.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    out_a = jax.jit(lambda v, i: rows_m.apply(v, i, train=False,
                                              use_gt_label=True))(variables, inp)
    out_b = jax.jit(lambda v, i: table_m.apply(v, i, train=False,
                                               use_gt_label=True))(variables, inp)
    np.testing.assert_allclose(np.asarray(out_b["prob_logit"]),
                               np.asarray(out_a["prob_logit"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_b["pred_pos"]),
                               np.asarray(out_a["pred_pos"]), atol=2e-5)


# ---------------------------------------------------------------------------
# Stage-2 fused IEF decode (fused_ief_rows)
# ---------------------------------------------------------------------------

C_END, C_RC, C_POS = 32, 24 + 27, 51


def _ief_weights(rng):
    c_in = C_END + C_RC + C_POS + 16
    dims = [(c_in, GF4), (GF4, GF4 // 2), (GF4 // 2, GF4 // 4), (GF4 // 4, 1)]
    w = {"enc_w": rng.normal(size=(1, 16)).astype(np.float32),
         "enc_b": rng.normal(size=(16,)).astype(np.float32)}
    for i, (a, b) in enumerate(dims, 1):
        w[f"w{i}"] = (rng.normal(size=(a, b)) * 0.2).astype(np.float32)
        w[f"b{i}"] = (rng.normal(size=(b,)) * 0.1).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in w.items()}


@pytest.fixture(scope="module")
def ief_data():
    rng = np.random.default_rng(13)
    n = 96
    end = rng.normal(size=(n, C_END)).astype(np.float32)
    rc = rng.normal(size=(n, C_RC)).astype(np.float32)
    pos = (rng.normal(size=(n, C_POS)) * 0.5).astype(np.float32)
    return (jnp.asarray(end), jnp.asarray(rc), jnp.asarray(pos),
            _ief_weights(rng))


def test_xla_ief_rows_matches_flax_ief(ief_data):
    """The split-layer-1 parts math is a reassociation of the flax IEF
    module over the concatenated embed [end | roi | pos | dir]."""
    from implicit_depth_tpu.models.imnet import IEF
    from implicit_depth_tpu.ops.pallas_ray_decode import xla_ief_rows

    end, rc, pos, w = ief_data
    # embed layout is [end | roi | pos | dir]; rc = [roi | dir]
    c_roi = C_RC - 27
    embed = jnp.concatenate([end, rc[:, :c_roi], pos, rc[:, c_roi:]], -1)
    mod = IEF(out_dim=1, gf_dim=GF4 // 4, n_iter=2, dtype=jnp.float32)
    params = {"params": {
        "Dense_0": {"kernel": w["enc_w"], "bias": w["enc_b"]},
        "_MLP4_0": {f"Dense_{i}": {"kernel": w[f"w{i + 1}"],
                                   "bias": w[f"b{i + 1}"]} for i in range(4)},
    }}
    want = mod.apply(params, embed)[..., 0]
    got = xla_ief_rows(end, rc, pos, w, n_iter=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_ief_rows_matches_xla(ief_data):
    from implicit_depth_tpu.ops.pallas_ray_decode import (
        fused_ief_rows,
        xla_ief_rows,
    )

    end, rc, pos, w = ief_data
    for n in (96, 70):  # 70 exercises ragged tile padding (tile 32)
        want = xla_ief_rows(end[:n], rc[:n], pos[:n], w, n_iter=2,
                            dtype=jnp.float32)
        got = fused_ief_rows(end[:n], rc[:n], pos[:n], w, 27, 2, 0.001,
                             False, jnp.float32, 32, True)  # interpret mode
        assert got.shape == (n,)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_fused_ief_rows_grads_match_xla(ief_data):
    from implicit_depth_tpu.ops.pallas_ray_decode import (
        fused_ief_rows,
        xla_ief_rows,
    )

    end, rc, pos, w = ief_data

    def loss_kernel(e, r, p, ws):
        return jnp.sum(fused_ief_rows(e, r, p, ws, 27, 2, 0.001, False,
                                      jnp.float32, 32, True) * 1.3)

    def loss_xla(e, r, p, ws):
        return jnp.sum(xla_ief_rows(e, r, p, ws, n_iter=2,
                                    dtype=jnp.float32) * 1.3)

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(end, rc, pos, w)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(end, rc, pos, w)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_refine_model_fused_matches_plain():
    """RefineModel with use_pallas_decode=True (interpret mode on CPU) must
    reproduce the plain flax IEF decode path."""
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs
    from implicit_depth_tpu.models.refine import RefineModel

    H, W = 48, 64
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=512, n_rays=256,
                        k_pairs=8)
    lidf = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                     imnet_gf=8, resnet_stages=(1, 1, 1, 1), pairs_budget=4,
                     pairs_budget_mode="per_ray")
    mk = lambda pallas: RefineModel(
        static=static, pnet_out=16, pnet_gf=8, imnet_gf=8,
        use_pallas_decode=pallas, decode_rows_per_tile=64)
    plain, fused = mk(False), mk(True)

    raw = synthetic_batch(7, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: lidf.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    lout = jax.jit(lambda v, i: lidf.apply(v, i, train=False,
                                           use_gt_label=True))(variables, inp)
    rvars = jax.jit(lambda k, i, o: plain.init(
        k, i, o, o["pred_pos"]))(jax.random.key(2), inp, lout)
    out_a = jax.jit(lambda v, i, o: plain.apply(
        v, i, o, o["pred_pos"]))(rvars, inp, lout)
    out_b = jax.jit(lambda v, i, o: fused.apply(
        v, i, o, o["pred_pos"]))(rvars, inp, lout)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=2e-5)


def test_refine_model_fused_nondefault_multires_views():
    """Regression: the layer-1 row split depends on the encoded-dir width —
    a non-default refine.multires_views must still match the plain path
    (c_dir is threaded from dir_e's shape, not hardcoded 27)."""
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs
    from implicit_depth_tpu.models.refine import RefineModel

    H, W = 48, 64
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=512, n_rays=256,
                        k_pairs=8)
    lidf = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                     imnet_gf=8, resnet_stages=(1, 1, 1, 1), pairs_budget=4,
                     pairs_budget_mode="per_ray")
    mk = lambda pallas: RefineModel(
        static=static, pnet_out=16, pnet_gf=8, imnet_gf=8, multires_views=2,
        use_pallas_decode=pallas, decode_rows_per_tile=64)
    plain, fused = mk(False), mk(True)

    raw = synthetic_batch(9, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inp = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: lidf.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inp)
    lout = jax.jit(lambda v, i: lidf.apply(v, i, train=False,
                                           use_gt_label=True))(variables, inp)
    rvars = jax.jit(lambda k, i, o: plain.init(
        k, i, o, o["pred_pos"]))(jax.random.key(2), inp, lout)
    out_a = jax.jit(lambda v, i, o: plain.apply(
        v, i, o, o["pred_pos"]))(rvars, inp, lout)
    out_b = jax.jit(lambda v, i, o: fused.apply(
        v, i, o, o["pred_pos"]))(rvars, inp, lout)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=2e-5)


def test_packed_l1_weights_match_unpacked(data):
    """The off|prob layer-1 width pack must be (near-)bit-identical to the
    unpacked path, independent of the IDT_DECODE_PACK_L1 env state: drive
    _decode_rows directly with both weight preparations (f32 so the only
    permitted difference is matmul tiling)."""
    from implicit_depth_tpu.ops.pallas_ray_decode import (
        _decode_rows, _prep_weights)

    pair_vox, pos, ray_feat, w = data
    c_pos = 102
    multires = (c_pos // 6 - 1) // 2
    dt = jnp.float32

    def run(pack):
        wp = _prep_weights(w, CV, ray_feat.shape[1] - 27, c_pos, 27, dt,
                           pack_l1=pack)
        dot = lambda a, b: a @ b
        if pack:
            ray_e1 = dot(ray_feat, wp["lr_w1"])
            ray_prob = None
        else:
            ray_e1 = dot(ray_feat, wp["offr_w1"])
            ray_prob = dot(ray_feat, wp["probr_w1"])
        return _decode_rows(pair_vox.astype(dt), pos.astype(jnp.float32),
                            ray_e1, ray_prob, wp, KB, n_iter=2,
                            init_offset=0.001, use_sigmoid=False, dtype=dt)

    off_u, logit_u = jax.jit(lambda: run(False))()
    off_p, logit_p = jax.jit(lambda: run(True))()
    np.testing.assert_allclose(np.asarray(off_p), np.asarray(off_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logit_p), np.asarray(logit_u),
                               rtol=1e-5, atol=1e-5)

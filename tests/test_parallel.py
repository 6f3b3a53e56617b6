"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from implicit_depth_tpu.models.lidf import hard_neg_mean
from implicit_depth_tpu.parallel.hardneg import sharded_hard_neg_mean
from implicit_depth_tpu.parallel.mesh import make_mesh, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must set 8 virtual devices"
    return make_mesh((8,), ("data",))


def test_sharded_hard_neg_matches_global(mesh, rng):
    x = rng.normal(size=(8, 128)).astype(np.float32)
    mask = rng.uniform(size=(8, 128)) > 0.3
    ratio = 0.1

    want = hard_neg_mean(jnp.asarray(x), jnp.asarray(mask), ratio)

    fn = shard_map(
        lambda xl, ml: sharded_hard_neg_mean(xl, ml, ratio, "data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = fn(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_gspmd_train_step_grads_match_single_device(mesh):
    """The sharded train step must produce the same loss/grads as unsharded —
    i.e. GSPMD's implicit psum ≡ DDP's all-reduce (SURVEY.md §2.2)."""
    import jax.numpy as jnp
    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import (
        LIDFModel, LIDFStatic, lidf_loss, prepare_inputs)

    H, W = 48, 64
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    raw = synthetic_batch(0, 8, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inputs)

    def loss_fn(params, b):
        inp = prepare_inputs(static, b, jax.random.key(0), train=True)
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          inp, train=False, use_gt_label=True)
        return lidf_loss(inp, out, train=True, img_hw=(H, W))["loss_net"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss_single, grads_single = grad_fn(variables["params"], batch)

    sharded = shard_batch(batch, mesh)
    loss_shard, grads_shard = grad_fn(variables["params"], sharded)

    np.testing.assert_allclose(float(loss_single), float(loss_shard), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(grads_single), jax.tree.leaves(grads_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_ray_axis_sharded_eval_matches_unsharded(mesh):
    """Sequence-parallel analog: rays sharded over the mesh at eval bs=1."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs
    from implicit_depth_tpu.train.state import TrainState, make_tx
    from implicit_depth_tpu.train.steps import make_lidf_eval_step

    H, W = 48, 64
    cfg = load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": H, "img_width": W},
        "grid": {"valid_sample_num": 128},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"}})
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=H * W,
                        k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    raw = synthetic_batch(0, 1, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=False))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    tx = make_tx(cfg.training, 10)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    plain = make_lidf_eval_step(cfg, model)
    _, out_a, loss_a = plain(state, batch, jax.random.key(2))

    ray_mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("data", "rays"))
    with jax.set_mesh(ray_mesh):
        sharded = make_lidf_eval_step(cfg, model, ray_axis="rays")
        _, out_b, loss_b = sharded(state, batch, jax.random.key(2))
    np.testing.assert_allclose(float(loss_a["loss_net"]), float(loss_b["loss_net"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a["pred_pos"]),
                               np.asarray(out_b["pred_pos"]), atol=1e-4)


def test_data_rays_mesh_train_step_matches_single_device():
    """The trainer's (data × rays) mesh — batch on 2 devices, rays on 4 —
    must reproduce the unsharded step exactly (VERDICT r1 weak #3: all chips
    participate when batch < device count)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs
    from implicit_depth_tpu.train.state import TrainState, make_tx
    from implicit_depth_tpu.train.steps import make_lidf_train_step

    H, W = 48, 64
    cfg = load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": H, "img_width": W},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"}})
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    raw = synthetic_batch(0, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inputs)
    tx = make_tx(cfg.training, 10)

    def run(step, b, m=None):
        # fresh buffers per run — the train step donates its state
        fresh = jax.tree.map(jnp.array, variables)
        state = TrainState.create(fresh["params"], fresh["batch_stats"], tx)
        if m is not None:
            repl = NamedSharding(m, P())
            state = jax.tree.map(
                lambda x: jax.device_put(x, repl) if isinstance(x, jax.Array) else x,
                state)
        state, losses = step(state, b, jax.random.key(2), jnp.asarray(0))
        return state, {k: float(v) for k, v in losses.items()}

    plain = make_lidf_train_step(cfg, model)
    state_a, loss_a = run(plain, batch)

    m = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "rays"))
    sharded_batch = shard_batch(batch, m)
    stepped = make_lidf_train_step(cfg, model, mesh=m)
    state_b, loss_b = run(stepped, sharded_batch, m)

    for k in loss_a:
        np.testing.assert_allclose(loss_a[k], loss_b[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_chunked_eval_matches_one_shot():
    """tpu.eval_rays_per_chunk: lax.map'd per-ray decode ≡ one-shot eval
    (bounds eval peak memory for the 76 800-ray full-pixel pass)."""
    import jax.numpy as jnp
    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, prepare_inputs
    from implicit_depth_tpu.train.state import TrainState, make_tx
    from implicit_depth_tpu.train.steps import make_lidf_eval_step

    H, W = 48, 64
    mk_cfg = lambda chunk: load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": H, "img_width": W},
        "grid": {"valid_sample_num": 128},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32",
                "eval_rays_per_chunk": chunk}})
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=H * W,
                        k_pairs=8)
    model = LIDFModel(static=static, rgb_out=8, pnet_out=16, pnet_gf=8,
                      imnet_gf=8, resnet_stages=(1, 1, 1, 1))
    raw = synthetic_batch(0, 1, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=False))(
        batch, jax.random.key(0))
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    tx = make_tx(mk_cfg(0).training, 10)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    _, out_a, loss_a = make_lidf_eval_step(mk_cfg(0), model)(
        state, batch, jax.random.key(2))
    # 1000 does not divide 3072 rays -> exercises the padding path too
    _, out_b, loss_b = make_lidf_eval_step(mk_cfg(1000), model)(
        state, batch, jax.random.key(2))

    np.testing.assert_allclose(np.asarray(out_a["pred_pos"]),
                               np.asarray(out_b["pred_pos"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a["prob_logit"]),
                               np.asarray(out_b["prob_logit"]), atol=1e-5)
    np.testing.assert_allclose(float(loss_a["loss_net"]),
                               float(loss_b["loss_net"]), rtol=1e-5)


def test_batch_sharding_layout(mesh):
    x = jnp.zeros((8, 4, 4))
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.sharding.spec == P("data")
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (1, 4, 4)


def test_refine_train_step_matches_single_device():
    """Stage-2 (frozen LIDF + RefineNet + GLOBAL hard-neg top-k) on the
    trainer's (data × rays) mesh must reproduce the unsharded step exactly —
    the collective-heavy path the reference runs under DDP
    (/root/reference/src/trainers/train_refine.py:374-399; VERDICT r3 #3)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.builder import build_lidf, build_refine
    from implicit_depth_tpu.data.synthetic import synthetic_batch
    from implicit_depth_tpu.geometry.voxel import make_voxel_grid
    from implicit_depth_tpu.models.lidf import LIDFStatic, prepare_inputs
    from implicit_depth_tpu.train.state import TrainState, make_tx
    from implicit_depth_tpu.train.steps import make_refine_train_step

    H, W = 48, 64
    cfg = load_config(overrides={
        "mask_type": "all", "dataset": {"img_height": H, "img_width": W},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8,
                  "resnet_stages": (1, 1, 1, 1)},
        "refine": {"pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        # the hard-negative recipe: exercises the global top-k under the mesh
        "loss": {"hard_neg": True, "hard_neg_ratio": 0.1},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"}})
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=128,
                        k_pairs=8)
    lidf = build_lidf(cfg, static)
    refine = build_refine(cfg, static)

    raw = synthetic_batch(0, 2, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, jax.random.key(0))
    lidf_vars = jax.jit(lambda k, i: lidf.init(
        k, i, train=False, use_gt_label=True))(jax.random.key(1), inputs)
    lidf_out = jax.jit(lambda v, i: lidf.apply(
        v, i, train=False, use_gt_label=True))(lidf_vars, inputs)
    rvars = jax.jit(lambda k, i, o: refine.init(
        k, i, o, o["pred_pos"]))(jax.random.key(3), inputs, lidf_out)
    tx = make_tx(cfg.training, 10)

    def run(step, b, m=None):
        fresh = jax.tree.map(jnp.array, rvars)
        state = TrainState.create(fresh["params"], {}, tx)
        lv = lidf_vars
        if m is not None:
            repl = NamedSharding(m, P())
            put = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, repl) if isinstance(x, jax.Array)
                else x, t)
            state, lv = put(state), put(lv)
        state, losses = step(state, lv, b, jax.random.key(4), jnp.asarray(0))
        return state, {k: float(v) for k, v in losses.items()}

    plain = make_refine_train_step(cfg, lidf, refine)
    state_a, loss_a = run(plain, batch)

    m = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "rays"))
    sharded_batch = shard_batch(batch, m)
    stepped = make_refine_train_step(cfg, lidf, refine, mesh=m)
    state_b, loss_b = run(stepped, sharded_batch, m)

    for k in loss_a:
        np.testing.assert_allclose(loss_a[k], loss_b[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)

"""Scanned K-steps-per-call train superstep: equality with sequential steps
and trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.builder import build_lidf, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.train.feed import pack_super, put_batch
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.train.steps import (
    make_lidf_train_step,
    make_lidf_train_superstep,
)

H, W = 48, 64
K = 3


def tiny_cfg():
    return load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_width": W, "img_height": H},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"},
    })


def _init(cfg, static, model, batch):
    key = jax.random.key(0)
    inputs = jax.jit(lambda b, k: prepare_inputs(static, b, k, train=True))(
        batch, key)
    variables = jax.jit(lambda k, i: model.init(
        k, i, train=False, use_gt_label=True))(key, inputs)
    return TrainState.create(variables["params"], variables["batch_stats"],
                             make_tx(cfg.training, 10))


def test_superstep_equals_sequential_steps():
    cfg = tiny_cfg()
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    batches = [synthetic_batch(i, 2, H, W) for i in range(K)]
    jb0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state_a = _init(cfg, static, model, jb0)
    state_b = _init(cfg, static, model, jb0)  # fresh buffers (steps donate)

    step = make_lidf_train_step(cfg, model)
    superstep = make_lidf_train_superstep(cfg, model)
    key = jax.random.key(7)
    epoch = jnp.asarray(0)

    # sequential: the same per-step batches (shipped through the SAME packed
    # path so f16 quantization matches) and fold_in(key, i) per-step RNG
    seq_losses = []
    for i, b in enumerate(batches):
        jb = put_batch(dict(b), mesh=None, derive_xyz=True)
        state_a, losses = step(state_a, jb, jax.random.fold_in(key, i), epoch)
        seq_losses.append(losses)

    buf, spec = pack_super([dict(b) for b in batches], derive_xyz=True)
    state_b, sup_losses = superstep(state_b, jnp.asarray(buf), key, epoch,
                                    spec=spec)

    for i in range(K):
        np.testing.assert_allclose(
            float(sup_losses["loss_net"][i]), float(seq_losses[i]["loss_net"]),
            rtol=1e-5, atol=1e-6)
    # scan-body vs straight-line compilation reassociates float reductions;
    # a reassociated near-zero grad flips the SIGN of Adam's ~lr-sized update,
    # so equality holds to an absolute few-times-lr bound (lr=1e-3, 3 steps),
    # not a relative one
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=0, atol=5e-4)
    assert int(state_b.step) == K


@pytest.mark.slow
def test_trainer_superstep_epoch(tmp_path):
    from implicit_depth_tpu.train.trainer import LIDFTrainer
    cfg = load_config(overrides={
        "trainer_name": "lidf",
        "exp_type": "train",
        "base_log_dir": str(tmp_path / "logs"),
        "log_name": "super_smoke",
        "mask_type": "all",
        "seed": 0,
        # 5 batches of 2 = 2 superbatches of K=2 + 1 single-tail step
        "dataset": {"type": "synthetic", "synthetic_len": 10,
                    "img_width": W, "img_height": H},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "training": {"batch_size": 2, "valid_batch_size": 1, "nepochs": 1,
                     "num_workers": 2, "log_interval": 1, "do_valid": False},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32",
                "train_steps_per_call": 2},
    })
    tr = LIDFTrainer(cfg)
    means = tr.train_epoch(0)
    assert np.isfinite(means["loss_net"])
    # all 5 steps harvested into the meters (2 supersteps of 2 + 1 single)
    assert tr.meters._meters["loss_net"].n == 5
    assert int(jax.device_get(tr.state.step)) == 5


@pytest.mark.slow
def test_refine_trainer_superstep_epoch(tmp_path):
    from implicit_depth_tpu.train.trainer import RefineTrainer
    cfg = load_config(overrides={
        "trainer_name": "refine",
        "exp_type": "train",
        "base_log_dir": str(tmp_path / "logs"),
        "log_name": "refine_super_smoke",
        "mask_type": "all",
        "seed": 0,
        "dataset": {"type": "synthetic", "synthetic_len": 8,
                    "img_width": W, "img_height": H},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "training": {"batch_size": 2, "valid_batch_size": 1, "nepochs": 1,
                     "num_workers": 2, "log_interval": 1, "do_valid": False},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32",
                "train_steps_per_call": 2},
    })
    tr = RefineTrainer(cfg)  # random frozen LIDF (no lidf_ckpt_path)
    means = tr.train_epoch(0)
    assert np.isfinite(means["loss_net"])
    assert tr.meters._meters["loss_net"].n == 4  # 2 supersteps of 2
    assert int(jax.device_get(tr.state.step)) == 4

"""Preemption-safe mid-epoch checkpointing (training.ckpt_every_steps).

The reference checkpoints per epoch only (train_lidf.py:349-371); TPU pods
are preemptible, so the trainer can additionally snapshot latest_network
every N optimizer steps with enough metadata (step counter + RNG key state)
that resume re-aligns to the exact step. The gold test: an interrupted +
resumed run must produce BITWISE-identical parameters to an uninterrupted
run (same platform, same jit programs, deterministic epoch-seeded data
order)."""

import jax
import numpy as np
import pytest

from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.train.trainer import LIDFTrainer


def cfg_for(tmp_path, tag):
    return load_config(overrides={
        "trainer_name": "lidf",
        "exp_type": "train",
        "base_log_dir": str(tmp_path / f"logs_{tag}"),
        "log_name": "preempt",
        "mask_type": "all",
        "seed": 0,
        "dataset": {"type": "synthetic", "synthetic_len": 8,
                    "img_width": 64, "img_height": 48},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 256, "valid_sample_num": 256},
        "training": {"batch_size": 2, "valid_batch_size": 1, "nepochs": 1,
                     "num_workers": 2, "log_interval": 1, "do_valid": False,
                     "ckpt_every_steps": 2},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32",
                "train_steps_per_call": 1},
    })


class _Preempted(RuntimeError):
    pass


@pytest.mark.slow
def test_mid_epoch_resume_matches_uninterrupted(tmp_path):
    # -- run A: uninterrupted 1 epoch (4 optimizer steps) --------------------
    tr_a = LIDFTrainer(cfg_for(tmp_path, "a"))
    tr_a.run()
    params_a = jax.device_get(tr_a.state.params)

    # -- run B: killed after 2 steps (mid-epoch ckpt written at step 2) ------
    tr_b = LIDFTrainer(cfg_for(tmp_path, "b"))
    real_step = tr_b.train_step
    calls = {"n": 0}

    def dying_step(*a, **k):
        if calls["n"] >= 2:
            raise _Preempted("simulated preemption")
        calls["n"] += 1
        return real_step(*a, **k)

    tr_b.train_step = dying_step
    with pytest.raises(_Preempted):
        tr_b.run()
    assert calls["n"] == 2

    # -- run B2: resume in a fresh process-equivalent trainer ----------------
    cfg2 = cfg_for(tmp_path, "b")
    cfg2.resume = "latest_network"
    tr_b2 = LIDFTrainer(cfg2)
    assert tr_b2.start_epoch == 0
    assert tr_b2._resume_skip_steps == 2
    assert int(tr_b2.state.step) == 2
    tr_b2.run()
    assert int(tr_b2.state.step) == 4
    params_b = jax.device_get(tr_b2.state.params)

    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(params_b)}
    for path, leaf_a in flat_a:
        leaf_b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b),
                                      err_msg=jax.tree_util.keystr(path))

    # epoch-end save cleared the mid-epoch marker: a further resume starts
    # at the next epoch, not mid-epoch
    cfg3 = cfg_for(tmp_path, "b")
    cfg3.resume = "latest_network"
    tr_b3 = LIDFTrainer(cfg3)
    assert tr_b3.start_epoch == 1
    assert tr_b3._resume_skip_steps == 0

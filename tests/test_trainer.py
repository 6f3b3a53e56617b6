"""Trainer smoke tests on synthetic data (tiny shapes, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.train.trainer import LIDFTrainer, auto_log_name


def smoke_cfg(tmp_path, nepochs=1):
    return load_config(overrides={
        "trainer_name": "lidf",
        "exp_type": "train",
        "base_log_dir": str(tmp_path / "logs"),
        "log_name": "smoke",
        "mask_type": "all",
        "seed": 0,
        "dataset": {"type": "synthetic", "synthetic_len": 4,
                    "img_width": 64, "img_height": 48},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8},
        "grid": {"miss_sample_num": 256, "valid_sample_num": 256},
        "training": {"batch_size": 2, "valid_batch_size": 1, "nepochs": nepochs,
                     "num_workers": 2, "log_interval": 1, "do_valid": False},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"},
    })


def test_auto_log_name():
    cfg = load_config(overrides={"loss": {"hard_neg": True, "hard_neg_ratio": 0.1}})
    name = auto_log_name(cfg, "lidf")
    assert name.startswith("lidf_res8_miss20000")
    assert "hardneg0.1" in name


@pytest.mark.slow
def test_refine_trainer_smoke(tmp_path):
    from implicit_depth_tpu.train.trainer import RefineTrainer
    cfg = smoke_cfg(tmp_path)
    cfg.trainer_name = "refine"
    cfg.base_log_dir = str(tmp_path / "logs_refine")
    tr = RefineTrainer(cfg)  # random frozen LIDF (no lidf_ckpt_path)
    tr.run()
    assert tr.ckpt.latest_exists()
    res = tr.validate(0, max_batches=1)
    assert "synthetic" in res
    import numpy as np
    assert np.isfinite(res["synthetic"].get("loss_net", np.nan))
    tr.test()
    import os.path as osp
    assert osp.exists(osp.join(tr.result_dir, "synthetic.csv"))


@pytest.mark.slow
def test_lidf_trainer_epoch_and_resume(tmp_path):
    import os.path as osp

    cfg = smoke_cfg(tmp_path)
    cfg.training.train_vis_iter = 1  # train-time vis (≙ train_lidf.py:469-473)
    tr = LIDFTrainer(cfg)
    tr.run()
    assert tr.ckpt.latest_exists()
    assert osp.exists(tr.epoch_log_path)
    # best-metric tracking (≙ train_lidf.py:317-371): scalars updated, stored
    # in the ckpt meta, and a best_network snapshot written on improvement
    assert tr.best["min_err"] < 1e5
    assert osp.isdir(osp.join(tr.ckpt_dir, "best_network"))
    import glob as _glob
    assert _glob.glob(osp.join(tr.vis_dir, "train_ep0_*_panel.png"))

    # resume picks up epoch counter AND the best scalars
    cfg2 = smoke_cfg(tmp_path, nepochs=2)
    cfg2.resume = "latest_network"
    tr2 = LIDFTrainer(cfg2)
    assert tr2.start_epoch == 1
    assert tr2.best["min_err"] == pytest.approx(tr.best["min_err"])
    tr2.run()

    # eval path produces metrics
    res = tr2.validate(0, max_batches=1)
    # synthetic valid loader exists
    assert "synthetic" in res
    assert np.isfinite(res["synthetic"].get("loss_net", np.nan))


@pytest.mark.slow
def test_lidf_eval_with_pred_mask(tmp_path):
    """mask_type='pred' end-to-end (≙ pipeline.py:117-129): the dataset
    supplies a pred_mask batch key and the eval step consumes it."""
    cfg = smoke_cfg(tmp_path)
    cfg.mask_type = "pred"
    cfg.dataset.provide_pred_mask = True
    tr = LIDFTrainer(cfg)
    res = tr.validate(0, max_batches=1)
    assert "synthetic" in res
    assert np.isfinite(res["synthetic"].get("loss_net", np.nan))


@pytest.mark.slow
def test_lidf_valid_sample_num_all(tmp_path):
    """grid.valid_sample_num == -1 (use every valid pixel,
    ≙ pipeline.py:137-140) trains and evals."""
    cfg = smoke_cfg(tmp_path)
    cfg.grid.valid_sample_num = -1
    cfg.debug = True  # cap epoch length
    tr = LIDFTrainer(cfg)
    assert tr.static.use_all_valid
    assert tr.static.n_valid == 48 * 64
    means = tr.train_epoch(0)
    assert np.isfinite(means["loss_net"])


@pytest.mark.slow
def test_checkpoint_name_loads_best_network(tmp_path):
    """exp_type-test workflow: checkpoint_path + checkpoint_name=best_network
    must load the BEST refine snapshot (round-4 runner relies on this)."""
    from implicit_depth_tpu.train.trainer import RefineTrainer

    cfg = smoke_cfg(tmp_path)
    cfg.trainer_name = "refine"
    cfg.base_log_dir = str(tmp_path / "logs_refine")
    tr = RefineTrainer(cfg)
    tr.run()
    import os.path as osp
    assert osp.isdir(osp.join(tr.ckpt_dir, "best_network"))

    # after 1 epoch best == latest; overwrite best_network with a perturbed
    # copy so loading the wrong snapshot would be detectable
    import jax
    pert = jax.tree.map(
        lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tr.state.params)
    tr.ckpt.save_as(tr.state.replace(params=pert), 0, "best_network",
                    meta={"epoch": 0})

    cfg2 = smoke_cfg(tmp_path)
    cfg2.trainer_name = "refine"
    cfg2.base_log_dir = str(tmp_path / "logs_refine_test")
    cfg2.checkpoint_path = tr.ckpt_dir
    cfg2.checkpoint_name = "best_network"
    tr2 = RefineTrainer(cfg2)
    for a, b in zip(jax.tree.leaves(pert), jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_should_validate_interval(tmp_path):
    """training.valid_interval thins validation to every Nth epoch; the last
    epoch always validates."""
    cfg = smoke_cfg(tmp_path, nepochs=7)
    cfg.training.do_valid = True
    cfg.training.valid_interval = 3
    tr = LIDFTrainer.__new__(LIDFTrainer)  # no heavy setup needed
    tr.cfg = cfg
    assert [e for e in range(7) if tr._should_validate(e)] == [0, 3, 6]
    cfg.training.valid_start_epo = 2
    assert [e for e in range(7) if tr._should_validate(e)] == [2, 5, 6]
    cfg.training.do_valid = False
    assert [e for e in range(7) if tr._should_validate(e)] == []


def test_host_rss_recycle_guard(tmp_path):
    """tpu.host_rss_exit_gb: above the limit the trainer raises
    SystemExit(82) (clean resume point); 0 disables."""
    cfg = smoke_cfg(tmp_path)
    tr = LIDFTrainer.__new__(LIDFTrainer)
    tr.cfg = cfg
    cfg.tpu.host_rss_exit_gb = 0
    tr._maybe_recycle(0)  # disabled: no-op
    cfg.tpu.host_rss_exit_gb = 10000  # far above any real RSS
    tr._maybe_recycle(0)
    cfg.tpu.host_rss_exit_gb = 0.001  # below current RSS
    with pytest.raises(SystemExit) as e:
        tr._maybe_recycle(0)
    assert e.value.code == 82

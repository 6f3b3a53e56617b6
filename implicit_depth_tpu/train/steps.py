"""Jitted train / eval steps.

Parity: the per-iteration work of ``TrainLIDF.run_iteration``
(src/trainers/train_lidf.py:373-407) and ``TrainRefine.run_iteration``
(train_refine.py:374-399) — forward, loss, backward, optimizer — expressed as
one SPMD program. The reference's per-step DDP machinery maps as:

  consensus barriers + all_reduce flags  -> nothing (degenerate batches are
                                            masked values, SURVEY.md §2.2)
  DDP gradient bucket all-reduce         -> psum inserted by GSPMD when the
                                            batch axis is sharded
  SyncBatchNorm                          -> global batch-stat reductions,
                                            also automatic under GSPMD
  reduce_tensor metric averaging         -> metrics are already global means

Epoch-dependent switches (maxpool_label_epo curriculum, surf_norm_epo /
smooth_epo gates) enter as traced scalars so one compiled step serves every
epoch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic, lidf_loss, prepare_inputs
from implicit_depth_tpu.models.refine import RefineModel, refine_loss, perturb_pred_pos
from implicit_depth_tpu.train.state import TrainState


def _loss_kwargs(cfg, train: bool, epoch):
    loss = cfg.loss
    return dict(
        train=train,
        img_hw=(cfg.dataset.img_height, cfg.dataset.img_width),
        pos_w=loss.pos_w,
        surf_norm_w=loss.surf_norm_w,
        smooth_w=loss.smooth_w,
        surf_norm_on=epoch >= loss.surf_norm_epo,
        smooth_on=epoch >= loss.smooth_epo,
        hard_neg=bool(loss.hard_neg),
        hard_neg_ratio=float(loss.hard_neg_ratio or 0.1),
    )


def make_lidf_train_step(cfg, model: LIDFModel) -> Callable:
    """Returns train_step(state, batch, key, epoch) -> (state, metrics).

    The state is donated: params/opt-state buffers are updated in place
    rather than copied every step (callers must not reuse the old state —
    the trainers rebind immediately).
    """

    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, batch, key, epoch):
        inputs = prepare_inputs(model.static, batch, key, train=True,
                                mask_type=cfg.mask_type)
        use_gt = epoch < cfg.model.maxpool_label_epo

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, train=True, use_gt_label=use_gt,
                mutable=["batch_stats"])
            kw = _loss_kwargs(cfg, True, epoch)
            kw["prob_w"] = cfg.loss.prob_w
            losses = lidf_loss(inputs, out, **kw)
            return losses["loss_net"], (losses, mut["batch_stats"])

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return state, losses

    return train_step


def make_lidf_eval_step(cfg, model: LIDFModel, ray_axis: str | None = None) -> Callable:
    """Eval forward: mask_type-driven rays, no grad, running BN stats.

    ``ray_axis``: optional mesh axis name to shard the RAY dimension over —
    the sequence-parallel analog (SURVEY.md §5.7): at eval batch size 1 the
    76 800 per-pixel rays (not the batch) are what scales across chips. Under
    GSPMD a sharding constraint on the ray tensors is enough; XLA partitions
    the pair tensors, decode, and reductions accordingly.

    Returns eval_step(state, batch, key) -> (inputs, outputs, losses).
    """
    from jax.sharding import PartitionSpec as P

    def shard_rays(inputs):
        if ray_axis is None:
            return inputs
        cons = lambda x, spec: jax.lax.with_sharding_constraint(x, spec)
        out = dict(inputs)
        for k in ("miss_idx", "miss_slot", "miss_px", "miss_py"):
            out[k] = cons(inputs[k], P(None, ray_axis))
        out["miss_dir"] = cons(inputs["miss_dir"], P(None, ray_axis, None))
        for k in ("pair_cell", "pair_valid", "t_enter", "t_exit", "pair_label"):
            out[k] = cons(inputs[k], P(None, ray_axis, None))
        out["gt_pos"] = cons(inputs["gt_pos"], P(None, ray_axis, None))
        return out

    @jax.jit
    def eval_step(state: TrainState, batch, key):
        inputs = prepare_inputs(model.static, batch, key, train=False,
                                mask_type=cfg.mask_type)
        inputs = shard_rays(inputs)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          inputs, train=False, use_gt_label=False)
        kw = _loss_kwargs(cfg, False, jnp.asarray(10 ** 6))
        kw["prob_w"] = cfg.loss.prob_w
        losses = lidf_loss(inputs, out, **kw)
        return inputs, out, losses

    return eval_step


def make_refine_train_step(cfg, lidf_model: LIDFModel,
                           refine_model: RefineModel) -> Callable:
    """Stage-2 step: frozen stage-1 forward feeds the refine network
    (train_refine.py:376-399; LIDF frozen per :71-73).

    Returns train_step(state, lidf_vars, batch, key, epoch) -> (state, metrics).
    """
    forward_times = int(cfg.refine.forward_times)
    perturb = bool(cfg.refine.perturb)
    perturb_prob = float(cfg.refine.perturb_prob)

    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, lidf_vars, batch, key, epoch):
        k_prep, k_noise = jax.random.split(key)
        inputs = prepare_inputs(lidf_model.static, batch, k_prep, train=True,
                                mask_type=cfg.mask_type)
        use_gt = epoch < cfg.model.maxpool_label_epo
        lidf_out = lidf_model.apply(lidf_vars, inputs, train=False,
                                    use_gt_label=use_gt)
        lidf_out = jax.lax.stop_gradient(lidf_out)
        inputs = jax.lax.stop_gradient(inputs)

        def loss_fn(params):
            pred = lidf_out["pred_pos"]
            for it in range(forward_times):
                if perturb and it == 0:
                    pred = perturb_pred_pos(k_noise, pred, inputs["miss_dir"],
                                            perturb_prob)
                pred = refine_model.apply({"params": params}, inputs, lidf_out, pred)
            losses = refine_loss(inputs, pred, **_loss_kwargs(cfg, True, epoch))
            return losses["loss_net"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, losses

    return train_step


def make_refine_eval_step(cfg, lidf_model: LIDFModel,
                          refine_model: RefineModel) -> Callable:
    forward_times = int(cfg.refine.forward_times)
    use_all_pix = bool(cfg.refine.use_all_pix)

    @jax.jit
    def eval_step(state: TrainState, lidf_vars, batch, key):
        inputs = prepare_inputs(lidf_model.static, batch, key, train=False,
                                mask_type=cfg.mask_type)
        lidf_out = lidf_model.apply(lidf_vars, inputs, train=False,
                                    use_gt_label=False)
        inject = None
        if cfg.mask_type == "all" and not use_all_pix:
            # restrict injected predictions to zero-input-depth pixels
            zero_flat = (batch["depth_corrupt"].reshape(
                batch["depth_corrupt"].shape[0], -1) == 0)
            inject = jnp.take_along_axis(zero_flat, inputs["miss_idx"], axis=1)
        pred = lidf_out["pred_pos"]
        for _ in range(forward_times):
            pred = refine_model.apply({"params": state.params}, inputs,
                                      lidf_out, pred, inject)
        losses = refine_loss(inputs, pred, **_loss_kwargs(cfg, False, jnp.asarray(10 ** 6)))
        return inputs, lidf_out, pred, losses

    return eval_step

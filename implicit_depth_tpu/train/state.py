"""Train state, optimizer factory, and LR schedule.

Parity: src/utils/optimizer_utils.py:5-15 (Adam / RMSprop / SGD by name) and
the StepLR schedule wired in src/trainers/train_lidf.py:65-69
(gamma^floor(epoch/nepoch_decay)). The state bundles params, batch_stats
(ResNet BN) and the optax state, checkpointed as one pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=0, params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), tx=tx)


def step_lr(base_lr: float, steps_per_epoch: int, nepoch_decay: int,
            gamma: float) -> optax.Schedule:
    """StepLR: lr * gamma^floor(epoch / nepoch_decay), stepped per epoch."""
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // max(nepoch_decay, 1))
    return schedule


def make_optimizer(name: str,
                   lr: float | optax.Schedule,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    if name == "rmsprop":
        return optax.rmsprop(lr)
    if name == "sgd":
        return optax.sgd(lr)
    if name == "lbfgs":
        # ≙ the reference factory's LBFGS option (optimizer_utils.py:5-15 —
        # which has a missing-return bug and crashes if selected; this one
        # works). linesearch=None: the zoom linesearch needs value_fn threaded
        # through update(), which a fixed-step SGD-style loop doesn't have —
        # the lr schedule scales the L-BFGS direction instead.
        return optax.lbfgs(lr, linesearch=None)
    raise ValueError(f"unsupported optimizer {name!r}")


def make_tx(cfg_training, steps_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer + StepLR from a ``training`` config section."""
    sched = step_lr(cfg_training.lr, steps_per_epoch,
                    cfg_training.nepoch_decay, cfg_training.decay_gamma)
    return make_optimizer(cfg_training.optimizer_name, sched)

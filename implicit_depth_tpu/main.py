"""CLI launcher.

Parity: src/main.py:11-51 — two flags (default config + overlay configs),
seeding, dynamic trainer dispatch — minus the mp.spawn/DDP machinery: one
SPMD process per host, ``jax.distributed.initialize()`` when running under a
multi-host launcher.

Usage:
  python -m implicit_depth_tpu.main --cfg_paths configs/train_lidf.yaml
  python -m implicit_depth_tpu.main --cfg_paths configs/test_refine.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("implicit_depth_tpu")
    parser.add_argument("--default_cfg_path", default=None,
                        help="optional base YAML applied before cfg_paths")
    parser.add_argument("--cfg_paths", nargs="+", default=[],
                        help="experiment YAML overlays, applied in order")
    parser.add_argument("--set", nargs="*", default=[],
                        help="dotted overrides, e.g. training.lr=1e-4")
    args = parser.parse_args(argv)

    from implicit_depth_tpu.config import load_config

    paths = ([args.default_cfg_path] if args.default_cfg_path else []) + args.cfg_paths
    overrides = {}
    for kv in args.set:
        key, _, value = kv.partition("=")
        node = overrides
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            import ast
            node[parts[-1]] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            node[parts[-1]] = value
    cfg = load_config(*paths, overrides=overrides)

    if cfg.seed is not None:
        np.random.seed(cfg.seed)

    # persistent compile cache by default: repeat shapes skip XLA compilation
    # entirely (the remote-TPU backend included — measured minutes saved per
    # jit). Env vars, when set, win; no-op on the CPU backend (utils/cache.py).
    from implicit_depth_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    # multi-host bring-up (no-op single host): ≙ dist.init_process_group's
    # TCP rendezvous (src/trainers/train_lidf.py:676-682). On TPU pods the
    # plugin autodetects topology (bare initialize()); elsewhere — including
    # the 2-process CPU integration test — the explicit triplet env vars
    # drive it: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)

    from implicit_depth_tpu.train.trainer import TRAINERS

    trainer_cls = TRAINERS[cfg.trainer_name]
    trainer = trainer_cls(cfg)
    if cfg.exp_type == "train":
        trainer.run()
    elif cfg.exp_type in ("valid", "test"):
        trainer.test()
    else:
        raise ValueError(f"unknown exp_type {cfg.exp_type!r}")


if __name__ == "__main__":
    main()

"""Orbax checkpointing.

Parity: the reference saves per-submodule state dicts + optimizer + epoch +
best metrics in one file, ``latest_network.pth`` every epoch plus
``epoch{N:03d}_network.pth`` snapshots (src/trainers/train_lidf.py:349-371),
and restores with a shape-tolerant loader (utils/training_utils.py:27-63).
Here the whole TrainState pytree (params + batch_stats + opt_state + step)
plus a metadata dict goes through one orbax StandardCheckpointer; "tolerant"
restore is ``restore_partial`` which keeps the target's entries for any
missing/mismatched leaves.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

LATEST = "latest_network"
EPOCH_FMT = "epoch{:03d}_network"


class Checkpointer:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------
    def save(self, state: Any, epoch: int, meta: Optional[Dict] = None,
             snapshot: bool = False) -> None:
        tree = {"state": _strip_static(state)}
        meta = dict(meta or {}, epoch=epoch)
        self._write(os.path.join(self.ckpt_dir, LATEST), tree, meta)
        if snapshot:
            self._write(os.path.join(self.ckpt_dir, EPOCH_FMT.format(epoch)),
                        tree, meta)

    def _write(self, path: str, tree: Any, meta: Dict) -> None:
        # orbax writes to its own tmp dir and renames atomically; meta (free-
        # form dict: epoch, best metrics) goes in a JSON sidecar
        self._ckptr.save(path, tree, force=True)
        self._ckptr.wait_until_finished()
        import json
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)

    # -- restore ------------------------------------------------------------
    def restore(self, state_template: Any, name: str = LATEST) -> Tuple[Any, Dict]:
        path = os.path.join(self.ckpt_dir, name)
        target = {"state": _strip_static(state_template)}
        loaded = self._ckptr.restore(path, target)
        state = _merge_static(state_template, loaded["state"])
        import json
        meta = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return state, meta

    def latest_exists(self) -> bool:
        return os.path.isdir(os.path.join(self.ckpt_dir, LATEST))

    def list_snapshots(self):
        pat = re.compile(r"epoch(\d+)_network$")
        out = []
        for d in os.listdir(self.ckpt_dir):
            m = pat.match(d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)


def _strip_static(state: Any) -> Any:
    """Drop non-pytree (static) fields such as the optax transformation."""
    if hasattr(state, "params"):  # TrainState
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
    return state


def _merge_static(template: Any, loaded: Any) -> Any:
    if hasattr(template, "params"):
        return template.replace(
            step=int(np.asarray(loaded["step"])),
            params=loaded["params"],
            batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"],
        )
    return loaded


def merge_compatible(target: Any, loaded: Any, path: str = "") -> Any:
    """Shape-tolerant merge ≙ the reference's ``restore``
    (utils/training_utils.py:27-63): take ``loaded`` leaves whose shape and
    dtype match the target; keep the target's value (and report) otherwise.
    Missing/extra subtrees fall back to the target likewise.
    """
    import jax.numpy as jnp

    if isinstance(target, dict):
        if not isinstance(loaded, dict):
            print(f"ckpt merge: subtree mismatch at {path!r}, keeping target")
            return target
        out = {}
        for k, v in target.items():
            if k in loaded:
                out[k] = merge_compatible(v, loaded[k], f"{path}/{k}")
            else:
                print(f"ckpt merge: missing {path}/{k}, keeping target")
                out[k] = v
        return out
    t = np.asarray(target)
    try:
        l = np.asarray(loaded)
    except Exception:
        print(f"ckpt merge: unreadable leaf at {path!r}, keeping target")
        return target
    if t.shape != l.shape:
        print(f"ckpt merge: shape mismatch at {path!r} "
              f"({l.shape} vs {t.shape}), keeping target")
        return target
    return jnp.asarray(l.astype(t.dtype))


def restore_params_only(ckpt_dir: str, params_template: Any,
                        name: str = LATEST) -> Tuple[Any, Any]:
    """Load just (params, batch_stats) — e.g. the frozen stage-1 LIDF inside
    stage-2 training (train_refine.py:60-73). Restores the raw saved tree
    (no target) so the caller needs no optimizer-state template."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    loaded = ckptr.restore(path)
    return loaded["state"]["params"], loaded["state"]["batch_stats"]

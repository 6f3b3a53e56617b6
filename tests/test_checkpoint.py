import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.train.checkpoint import (
    Checkpointer,
    merge_compatible,
    restore_params_only,
)
from implicit_depth_tpu.train.state import TrainState, make_tx
from implicit_depth_tpu.config import default_config


def _state():
    params = {"a": jnp.ones((3, 4)), "b": {"w": jnp.zeros((2,))}}
    tx = make_tx(default_config().training, 10)
    return TrainState.create(params, {"bn": jnp.ones((4,))}, tx)


def test_save_restore_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path))
    state = _state()
    state = state.replace(params={"a": state.params["a"] * 2.5,
                                  "b": state.params["b"]})
    ck.save(state, epoch=3, meta={"best": 0.5}, snapshot=True)
    assert ck.latest_exists()
    assert ck.list_snapshots() == [3]

    restored, meta = ck.restore(_state())
    assert meta["epoch"] == 3 and meta["best"] == 0.5
    np.testing.assert_allclose(np.asarray(restored.params["a"]), 2.5)

    params, bstats = restore_params_only(str(tmp_path),
                                         {"params": state.params,
                                          "batch_stats": state.batch_stats})
    np.testing.assert_allclose(np.asarray(params["a"]), 2.5)
    np.testing.assert_allclose(np.asarray(bstats["bn"]), 1.0)

    # named-snapshot load (the stage-2 `lidf_ckpt_name: best_network` path)
    best = state.replace(params={"a": state.params["a"] * 0 + 7.0,
                                 "b": state.params["b"]})
    ck.save_as(best, epoch=2, name="best_network", meta={"best": 0.1})
    params, _ = restore_params_only(str(tmp_path),
                                    {"params": state.params,
                                     "batch_stats": state.batch_stats},
                                    name="best_network")
    np.testing.assert_allclose(np.asarray(params["a"]), 7.0)


def test_restore_params_only_tolerates_reshaped_ckpt(tmp_path):
    """A checkpoint whose leaf shapes drifted partial-loads: matching leaves
    are taken, mismatched ones keep the template (≙ reference restore,
    utils/training_utils.py:27-63)."""
    ck = Checkpointer(str(tmp_path))
    ck.save(_state(), epoch=0)

    template = {"params": {"a": jnp.full((3, 4), 7.0),      # matches -> taken
                           "b": {"w": jnp.full((9,), 7.0)},  # reshaped -> kept
                           "extra": jnp.full((2, 2), 7.0)},  # missing -> kept
                "batch_stats": {"bn": jnp.zeros((4,))}}
    params, bstats = restore_params_only(str(tmp_path), template)
    np.testing.assert_allclose(np.asarray(params["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(params["b"]["w"]), 7.0)
    np.testing.assert_allclose(np.asarray(params["extra"]), 7.0)
    np.testing.assert_allclose(np.asarray(bstats["bn"]), 1.0)


def test_restore_falls_back_to_tolerant_merge(tmp_path):
    """Checkpointer.restore of a structurally drifted state must not crash:
    strict orbax load fails, the tolerant path merges what it can and
    reinitializes the optimizer state."""
    ck = Checkpointer(str(tmp_path))
    ck.save(_state(), epoch=2)

    # template with a reshaped leaf and a new param -> strict restore fails
    params = {"a": jnp.full((3, 4), 5.0), "b": {"w": jnp.full((6,), 5.0)},
              "new": jnp.full((2,), 5.0)}
    tx = make_tx(default_config().training, 10)
    template = TrainState.create(params, {"bn": jnp.zeros((4,))}, tx)

    restored, meta = ck.restore(template)
    assert meta["epoch"] == 2
    np.testing.assert_allclose(np.asarray(restored.params["a"]), 1.0)   # taken
    np.testing.assert_allclose(np.asarray(restored.params["b"]["w"]), 5.0)  # kept
    np.testing.assert_allclose(np.asarray(restored.params["new"]), 5.0)     # kept
    np.testing.assert_allclose(np.asarray(restored.batch_stats["bn"]), 1.0)
    # optimizer state was reinitialized for the new param tree
    assert len(jax.tree.leaves(restored.opt_state)) == len(
        jax.tree.leaves(tx.init(params)))


def test_merge_compatible_tolerates_mismatches():
    target = {"a": jnp.zeros((3, 4)), "b": {"w": jnp.zeros((2,)),
                                            "new": jnp.zeros((5,))}}
    loaded = {"a": np.ones((3, 4)), "b": {"w": np.ones((7,))}}  # w mismatched
    out = merge_compatible(target, loaded)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)      # taken
    np.testing.assert_allclose(np.asarray(out["b"]["w"]), 0.0)  # kept (shape)
    np.testing.assert_allclose(np.asarray(out["b"]["new"]), 0.0)  # kept (missing)


def test_crash_safe_overwrite_keeps_a_snapshot(tmp_path):
    """orbax force=True deletes the destination before committing (reproduced
    on this image) — Checkpointer._write must never leave the disk without a
    complete snapshot: a kill between its two renames leaves ``.prev``, which
    latest_exists()/restore() fall back to."""
    import os
    import jax.numpy as jnp
    from implicit_depth_tpu.train.checkpoint import Checkpointer, LATEST

    ck = Checkpointer(str(tmp_path))
    state_a = {"step": jnp.asarray(1), "params": {"w": jnp.ones((3,))},
               "batch_stats": {}, "opt_state": ()}
    ck.save(state_a, 0, meta={"tag": 1})
    state_b = {**state_a, "params": {"w": jnp.full((3,), 2.0)}}
    ck.save(state_b, 1, meta={"tag": 2})

    # simulate a preemption exactly between the two renames of the NEXT save:
    # the main dir is gone, only .prev (the previous complete snapshot) exists
    base = os.path.join(str(tmp_path), LATEST)
    os.rename(base, base + ".prev")
    os.replace(base + ".meta.json", base + ".prev.meta.json")
    assert ck.latest_exists()
    restored, meta = ck.restore(dict(state_b))
    assert float(restored["params"]["w"][0]) == 2.0
    assert meta["tag"] == 2

    # a subsequent save heals the layout
    ck.save(state_a, 2, meta={"tag": 3})
    assert os.path.isdir(base)
    _, meta = ck.restore(dict(state_a))
    assert meta["tag"] == 3

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


def test_merge_compatible_tolerates_mismatches():
    target = {"a": jnp.zeros((3, 4)), "b": {"w": jnp.zeros((2,)),
                                            "new": jnp.zeros((5,))}}
    loaded = {"a": np.ones((3, 4)), "b": {"w": np.ones((7,))}}  # w mismatched
    out = merge_compatible(target, loaded)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)      # taken
    np.testing.assert_allclose(np.asarray(out["b"]["w"]), 0.0)  # kept (shape)
    np.testing.assert_allclose(np.asarray(out["b"]["new"]), 0.0)  # kept (missing)

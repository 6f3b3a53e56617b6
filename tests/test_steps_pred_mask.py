"""mask_type='pred' eval path: external predicted mask drives the rays."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import LIDFStatic, prepare_inputs

H, W = 48, 64


def test_pred_mask_rays():
    raw = synthetic_batch(0, 1, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    static = LIDFStatic(grid=make_voxel_grid(8), n_valid=128, n_rays=H * W,
                        k_pairs=8)
    pred_mask = np.zeros((1, H, W), np.float32)
    pred_mask[0, 10:20, 10:30] = 1.0

    inp = jax.jit(lambda b, k, pm: prepare_inputs(
        static, b, k, train=False, mask_type="pred", pred_mask=pm))(
        batch, jax.random.key(0), jnp.asarray(pred_mask))
    slot = np.asarray(inp["miss_slot"]).reshape(H * W)
    # exactly the pred-mask pixels are rays
    np.testing.assert_array_equal(slot, pred_mask.reshape(-1) > 0.5)
    # valid mask is the complement (mask_type='pred' semantics,
    # pipeline.py:127-129)
    valid = np.asarray(inp["valid_slot"])
    assert valid.all()  # sampled points all come from the complement

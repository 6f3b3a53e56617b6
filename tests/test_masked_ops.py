import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.masked import (
    masked_argmax,
    masked_log_softmax,
    masked_softmax,
)
from implicit_depth_tpu.ops.segment import segment_max0


def test_masked_softmax_matches_dense_on_full_rows(rng):
    x = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    full = jnp.ones((5, 7), bool)
    got = np.asarray(masked_softmax(x, full))
    want = np.asarray(jnp.exp(x) / jnp.exp(x).sum(-1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_softmax_excludes_and_handles_empty(rng):
    x = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    mask = jnp.asarray([[True, False, True, False],
                        [False, False, False, False]])
    s = np.asarray(masked_softmax(x, mask))
    assert s[0, 1] == 0 and s[0, 3] == 0
    np.testing.assert_allclose(s[0].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(s[1], 0.0)  # empty row -> zeros, no NaN

    ls = np.asarray(masked_log_softmax(x, mask))
    np.testing.assert_allclose(np.exp(ls[0, [0, 2]]).sum(), 1.0, rtol=1e-5)
    assert np.isfinite(ls).all()


def test_masked_argmax_ties_and_empty():
    v = jnp.asarray([[1.0, 5.0, 5.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    mask = jnp.asarray([[True, False, True, True],
                        [False, False, False, False]])
    idx, ok = masked_argmax(v, mask)
    assert int(idx[0]) == 2          # masked-out 5.0 at slot 1 ignored
    assert bool(ok[0]) and not bool(ok[1])
    assert int(idx[1]) == 0          # empty row -> 0 with ok=False


def test_segment_max0_with_negatives_and_empty(rng):
    data = jnp.asarray([[-1.0, -2.0], [-3.0, -0.5], [2.0, 1.0]])
    ids = jnp.asarray([0, 0, 2], jnp.int32)
    out = np.asarray(segment_max0(data, ids, 4))
    np.testing.assert_allclose(out[0], [-1.0, -0.5])
    np.testing.assert_allclose(out[1], 0.0)  # empty segment -> exact zeros
    np.testing.assert_allclose(out[2], [2.0, 1.0])
    np.testing.assert_allclose(out[3], 0.0)
    # valid mask excludes rows
    out2 = np.asarray(segment_max0(data, ids, 4,
                                   valid=jnp.asarray([True, False, True])))
    np.testing.assert_allclose(out2[0], [-1.0, -2.0])

def test_segment_max0_bf16_matches_f32(rng):
    """The PointNet scatters run in the compute dtype (bf16 on TPU): for
    bf16-representable inputs the reduced-precision scatter must be
    bit-identical to the f32 one after upcast, incl. -inf masking and
    empty-segment zeros (ops/segment.py dtype-preserving fill)."""
    data32 = np.abs(rng.normal(size=(64, 8)).astype(np.float32))  # post-ReLU-like
    data16 = jnp.asarray(data32, jnp.bfloat16)
    data32 = np.asarray(data16, np.float32)  # bf16-representable values
    ids = jnp.asarray(rng.integers(0, 9, 64), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=64) > 0.3)
    out16 = segment_max0(data16, ids, 10, valid)
    out32 = segment_max0(jnp.asarray(data32), ids, 10, valid)
    assert out16.dtype == jnp.bfloat16 and out32.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out16, np.float32),
                                  np.asarray(out32))

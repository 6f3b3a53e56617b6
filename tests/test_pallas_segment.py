"""Pallas VMEM-table segmented max ≡ segment_max0 on non-negative data
(interpret mode on CPU; the real-chip A/B lives in
scripts/bench_segmax_pallas.py, result recorded in BASELINE.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from implicit_depth_tpu.ops.pallas_segment import pallas_segment_max0
from implicit_depth_tpu.ops.segment import segment_max0


@pytest.mark.parametrize("n,c,s,tile", [
    (1000, 64, 2916, 256),    # refine stage-1 shape (scaled down)
    (777, 128, 100, 256),     # ragged n (pad path), stage-2 channels
    (64, 32, 8, 64),          # c below lane width
])
def test_matches_segment_max0_nonneg(rng, n, c, s, tile):
    data = jnp.asarray(np.abs(rng.normal(size=(n, c))).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, s, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) > 0.3)
    ref = segment_max0(data, ids, s, valid)
    got = pallas_segment_max0(data, ids, s, valid, rows_per_tile=tile,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_no_valid_mask_and_empty_segments(rng):
    data = jnp.asarray(np.abs(rng.normal(size=(50, 16))).astype(np.float32))
    ids = jnp.asarray((rng.integers(0, 3, 50)).astype(np.int32))  # segs 3..9 empty
    ref = segment_max0(data, ids, 10)
    got = pallas_segment_max0(data, ids, 10, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert np.all(np.asarray(got)[3:] == 0)


def test_bf16(rng):
    data = jnp.asarray(np.abs(rng.normal(size=(200, 64))), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, 30, 200).astype(np.int32))
    ref = segment_max0(data, ids, 30)
    got = pallas_segment_max0(data, ids, 30, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(got, np.float32))

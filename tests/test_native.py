"""Native C++ runtime vs pure-python reference implementations."""

import numpy as np
import pytest

from implicit_depth_tpu import native
from implicit_depth_tpu.data.exr import read_exr, write_exr

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")


@needs_native
def test_native_exr_matches_python(tmp_path, rng):
    img = rng.normal(size=(45, 67)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, {"R": img}, compression=3)
    # read_exr dispatches to native when available
    out = read_exr(path)
    np.testing.assert_allclose(out["R"], img, rtol=1e-6)


@needs_native
def test_native_connected_components_matches_scipy(rng):
    from scipy.ndimage import label
    mask = (rng.uniform(size=(64, 80)) < 0.4)
    got = native.connected_components(mask)
    want, n = label(mask)
    # same component structure: bijection between label sets
    assert got.shape == want.shape
    assert (got > 0).sum() == (want > 0).sum()
    assert got.max() == n
    # pixels share a native label iff they share a scipy label
    pair = got.astype(np.int64) * (want.max() + 1) + want
    assert len(np.unique(pair[mask])) == n
    assert not got[~mask].any()


@needs_native
def test_native_cc_simple_shapes():
    mask = np.zeros((6, 6), np.uint8)
    mask[0, :3] = 1          # component 1
    mask[2:4, 2:4] = 1       # component 2
    mask[5, 5] = 1           # component 3
    lab = native.connected_components(mask)
    assert lab.max() == 3
    assert lab[0, 0] == lab[0, 2] != 0
    assert lab[2, 2] == lab[3, 3] != 0
    assert lab[5, 5] not in (0, lab[0, 0], lab[2, 2])

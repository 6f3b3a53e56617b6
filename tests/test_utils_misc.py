import numpy as np

from implicit_depth_tpu.data.seg_io import (
    build_matrix_of_indices,
    imread_indexed,
    imwrite_indexed,
)
from implicit_depth_tpu.utils.profiling import stage_timer, stage_times


def test_indexed_png_roundtrip(tmp_path, rng):
    labels = rng.integers(0, 5, size=(24, 32)).astype(np.uint8)
    p = str(tmp_path / "seg.png")
    imwrite_indexed(p, labels)
    back = imread_indexed(p)
    np.testing.assert_array_equal(back, labels)


def test_build_matrix_of_indices():
    m = build_matrix_of_indices(3, 4)
    assert m.shape == (3, 4, 2)
    assert m[2, 1, 0] == 2 and m[2, 1, 1] == 1


def test_stage_timer():
    with stage_timer("a"):
        pass
    with stage_timer("a"):
        pass
    times = stage_times()
    assert "a" in times and times["a"] >= 0
    assert stage_times() == {}  # reset

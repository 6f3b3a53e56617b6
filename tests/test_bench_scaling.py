"""The weak-scaling harness (scripts/bench_scaling.py) must run end-to-end
on the CPU mesh so the ≥80% 1-chip→N north-star (BASELINE.json) is one
command away the day multi-chip hardware appears (VERDICT r3 #5).

The committed production-shape rows live in docs/scaling_cpu_r4.json. Note
rays/s is NOT asserted monotone here: the 8 virtual devices share this
box's physical cores, so weak scaling (constant per-device work) stops
growing at the physical core count — monotone throughput is the *TPU*
expectation, where each added device brings its own FLOPs.
"""

import importlib.util
import json
import math
import os.path as osp
import sys

import pytest


@pytest.fixture(scope="module")
def harness():
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "scripts", "bench_scaling.py")
    spec = importlib.util.spec_from_file_location("bench_scaling", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_scaling"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_scaling_harness_runs_all_device_counts(harness, monkeypatch):
    from implicit_depth_tpu.config import load_config

    # tiny shapes: the suite exercises the harness mechanics, not perf
    monkeypatch.setattr(harness, "H", 48)
    monkeypatch.setattr(harness, "W", 64)
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": 48, "img_width": 64},
        "grid": {"miss_sample_num": 128, "valid_sample_num": 128},
        "model": {"rgb_out": 8, "pnet_out": 16, "pnet_gf": 8, "imnet_gf": 8,
                  "resnet_stages": (1, 1, 1, 1)},
        "training": {"batch_size": 1},
        "tpu": {"max_pairs_per_ray": 8, "compute_dtype": "float32"},
    })
    times = {}
    for n in (1, 2, 4, 8):
        dt = harness.measure(n, cfg)
        # at these tiny shapes the (1,5)-iter slope can go slightly negative
        # under CPU scheduling jitter — assert the harness ran and produced a
        # number, not the sign of a noise-dominated slope (production-shape
        # rows in docs/scaling_cpu_r4.json are all positive)
        assert math.isfinite(dt), (n, dt)
        times[n] = dt
    assert sorted(times) == [1, 2, 4, 8]


def test_committed_scaling_artifact_is_sane():
    """docs/scaling_cpu_r4.json: the recorded harness rows parse and carry
    positive throughput for 1/2/4/8 devices."""
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "docs", "scaling_cpu_r4.json")
    data = json.load(open(path))
    rows = data["rows"]
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    for r in rows:
        assert r["rays_per_sec"] > 0
        assert 0 < r["scaling_efficiency"] <= 1.05

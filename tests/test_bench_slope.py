"""Unit tests for bench.py's interleaved-median slope timer (the driver
scoreboard — VERDICT r3 weak-1: a single (short, long) pair produced a
negative two-stage throughput in BENCH_r03)."""

import importlib.util
import os.path as osp
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def perf_counter(self):
        return self.t


def _patch_clock(bench, monkeypatch):
    clock = FakeClock()
    # bench._slope delegates to the shared interleaved_slope core
    from implicit_depth_tpu.utils import profiling
    monkeypatch.setattr(profiling.time, "perf_counter", clock.perf_counter)
    return clock


def test_slope_normal(bench, monkeypatch):
    clock = _patch_clock(bench, monkeypatch)
    mk = lambda iters: lambda: setattr(clock, "t", clock.t + 0.01 * iters)
    slope = bench._slope(mk(3), mk(13), 3, 13)
    assert slope == pytest.approx(0.01)


def test_slope_survives_first_phase_inflation(bench, monkeypatch):
    """A one-off slow first measured A rep (the BENCH_r03 pathology) must
    not flip the slope: the MEDIAN pair difference ignores it."""
    clock = _patch_clock(bench, monkeypatch)
    calls = {"a": 0}

    def run_a():
        calls["a"] += 1
        # reps 1-2 are compile+warm; rep 3 is the FIRST MEASURED A — inflate
        # it 20x (times[3] > times[13] -> naive slope would go negative)
        clock.t += 0.6 if calls["a"] == 3 else 0.03

    run_b = lambda: setattr(clock, "t", clock.t + 0.13)
    slope = bench._slope(run_a, run_b, 3, 13)
    assert slope == pytest.approx(0.01)


def test_slope_falls_back_to_conservative_mean(bench, monkeypatch, capsys):
    """If every interleaved rep is inverted (A slower than B), the retry
    exhausts and the long loop's per-iter mean is returned — positive and
    conservative, never a negative throughput."""
    clock = _patch_clock(bench, monkeypatch)
    run_a = lambda: setattr(clock, "t", clock.t + 0.5)   # always slow
    run_b = lambda: setattr(clock, "t", clock.t + 0.13)
    slope = bench._slope(run_a, run_b, 3, 13)
    assert slope == pytest.approx(0.13 / 13)
    assert slope > 0
    out = capsys.readouterr().out
    assert "non-positive slope" in out

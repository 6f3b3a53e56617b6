"""Tracing / profiling — a first-class subsystem (the reference has none:
SURVEY.md §5.1 — ``time`` imported but never used).

Two tools:

- ``stage_timer``: lightweight wall-clock stage timing with a single global
  registry, used by the trainers; honest on the remote-TPU relay because the
  caller controls where readbacks happen.
- ``device_slope_time``: the robust way to measure jitted-function device
  time on this image's remote TPU: run the function ``iters_a`` and
  ``iters_b`` times inside one ``lax.fori_loop`` dispatch each, read back one
  scalar, and take the slope. ``block_until_ready`` is NOT a reliable fence
  through the relay and a per-iteration readback pays ~25 ms RTT.
- ``trace``: context manager around ``jax.profiler`` for real trace dumps
  where the backend supports it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp

_REGISTRY: Dict[str, float] = {}


@contextlib.contextmanager
def stage_timer(name: str, sync: bool = False):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            jax.effects_barrier()
        _REGISTRY[name] = _REGISTRY.get(name, 0.0) + time.perf_counter() - t0


def stage_times(reset: bool = True) -> Dict[str, float]:
    out = dict(_REGISTRY)
    if reset:
        _REGISTRY.clear()
    return out


def interleaved_slope(run_a: Callable[[], None], run_b: Callable[[], None],
                      iters_a: int, iters_b: int,
                      reps: int = 3, retries: int = 1,
                      verbose: bool = False) -> float:
    """Seconds/iteration from two zero-arg loop runnables (``run_a`` executes
    ``iters_a`` iterations and blocks; ``run_b`` likewise) — THE shared slope
    core (bench.py, device_slope_time, scripts/bench_refine_train.py).

    Interleaved repeated slope (round-4 hardening): compile + one throwaway
    warm rep per loop, then alternate A B A B for ``reps`` pairs and take the
    MEDIAN pair difference — a single (short, long) pair is vulnerable to the
    first-measured-phase inflation that made BENCH_r03's throughput negative.
    A non-positive median retries ``retries`` times, then falls back to the
    long loop's per-iter mean (includes dispatch overhead — a conservative
    lower throughput bound, never a negative one)."""
    for run in (run_a, run_b):
        run()  # compile
        run()  # throwaway warm rep
    slope = None
    for attempt in range(retries + 1):
        diffs = []
        for _ in range(max(reps, 1)):
            t0 = time.perf_counter()
            run_a()
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_b()
            tb = time.perf_counter() - t0
            diffs.append(tb - ta)
        diffs.sort()
        slope = diffs[len(diffs) // 2] / (iters_b - iters_a)
        if slope > 0:
            return slope
        if verbose and attempt < retries:
            print(f"# non-positive slope {slope:.6f}s/iter — retrying",
                  flush=True)
    t0 = time.perf_counter()
    run_b()
    fallback = (time.perf_counter() - t0) / iters_b
    if verbose:
        print(f"# slope stayed non-positive ({slope:.6f}); using "
              f"conservative per-iter mean {fallback:.6f}s", flush=True)
    return fallback


def device_slope_time(fn_of_key: Callable[..., jnp.ndarray],
                      key: jax.Array, *args,
                      iters_a: int = 2, iters_b: int = 12,
                      reps: int = 3) -> float:
    """Seconds per invocation of ``fn_of_key(key, *args)`` (scalar return),
    via :func:`interleaved_slope` over in-graph fori loops.

    Pass large arrays through ``*args`` rather than closing over them —
    closed-over arrays become jit CONSTANTS, which this image ships to the
    remote compiler in the request body (HTTP 413 past ~100 MB).
    """

    def make(iters):
        @jax.jit
        def run(k, *a):
            def body(i, acc):
                return acc + fn_of_key(jax.random.fold_in(k, i), *a).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        def go():
            float(run(key, *args))
        return go

    return interleaved_slope(make(iters_a), make(iters_b), iters_a, iters_b,
                             reps=reps)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (works on backends that support profiling)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

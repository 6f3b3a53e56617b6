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


def device_slope_time(fn_of_key: Callable[..., jnp.ndarray],
                      key: jax.Array, *args,
                      iters_a: int = 2, iters_b: int = 12,
                      reps: int = 3) -> float:
    """Seconds per invocation of ``fn_of_key(key, *args)`` (scalar return).

    Interleaved repeated slope (round 4 — same hardening as bench.py): the
    short and long loops alternate for ``reps`` pairs after a compile + one
    throwaway warm rep each, and the MEDIAN pair difference is used — a
    single (short, long) pair is vulnerable to the first-measured-phase
    inflation that produced BENCH_r03's negative throughput. A non-positive
    median falls back to the long loop's per-iter mean (conservative).

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
        return run

    runs = {iters: make(iters) for iters in (iters_a, iters_b)}
    for run in runs.values():
        float(run(key, *args))  # compile
        float(run(key, *args))  # throwaway warm rep
    diffs = []
    for _ in range(max(reps, 1)):
        ts = {}
        for iters, run in runs.items():
            t0 = time.perf_counter()
            float(run(key, *args))
            ts[iters] = time.perf_counter() - t0
        diffs.append(ts[iters_b] - ts[iters_a])
    diffs.sort()
    slope = diffs[len(diffs) // 2] / (iters_b - iters_a)
    if slope <= 0:
        t0 = time.perf_counter()
        float(runs[iters_b](key, *args))
        slope = (time.perf_counter() - t0) / iters_b
    return slope


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

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
                      iters_a: int = 2, iters_b: int = 12) -> float:
    """Seconds per invocation of ``fn_of_key(key, *args)`` (scalar return).

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

    times = {}
    for iters in (iters_a, iters_b):
        run = make(iters)
        float(run(key, *args))  # compile + warm
        t0 = time.perf_counter()
        float(run(key, *args))
        times[iters] = time.perf_counter() - t0
    return (times[iters_b] - times[iters_a]) / (iters_b - iters_a)


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

"""Persistent XLA compile-cache setup shared by every entry point.

One helper instead of the previously copy-pasted 5-line block (bench.py,
main.py, scripts/bench_refine_train.py, __graft_entry__.py — ADVICE r4):
repeat jit shapes skip XLA compilation entirely, which through this image's
remote-TPU backend saves 2-15 minutes per shape (CLAUDE.md gotchas).

The cache is scoped to NON-CPU backends by default: XLA:CPU persists
machine-feature-specialized AOT code, and a primed cache crossing hosts
produced cpu_aot_loader errors ("could lead to execution errors such as
SIGILL", MULTICHIP_r04.json tail) — a correctness risk in the CPU-backed
driver dryrun, where the cache buys nothing anyway (ADVICE r4 medium).
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None,
                            allow_cpu: bool = False) -> bool:
    """Point jax at the persistent compile cache. Env vars, when set, win
    (returns False without touching config). No-op on the CPU backend unless
    ``allow_cpu`` — call this AFTER any ``jax_platforms`` override so the
    platform check sees the effective choice."""
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return False
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if not allow_cpu and platforms.strip().lower() == "cpu":
        return False
    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.path.expanduser("~/.cache/implicit_depth_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True

#!/usr/bin/env python
"""Isolate the remote-TPU plugin's device_put host-RSS leak (round 4).

Measured on this image (2026-08-20): 50 × 12 MB puts through the axon
backend leak +627 MB host RSS (~12.5 MB/put — the payload itself) even
after `del` + gc; the SAME loop on the CPU backend is flat (+85 MB
steady-state). The retention is inside /opt/axon/libaxon_pjrt.so — not in
jax or this framework. Production feed (train/feed.py packed single put,
~12 MB/step at B=4) therefore leaks ~12 MB/step and a 60×252-step run OOMs
a 125 GB host near 10k steps. Mitigation: tpu.host_rss_exit_gb +
resume-retry runners (scripts/run_disk_r4b.sh).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_put_leak.py [cpu]
"""

import gc
import sys

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    # env JAX_PLATFORMS=cpu alone is ignored — sitecustomize force-sets the
    # axon plugin; the config update must happen after import (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import psutil  # noqa: E402

P = psutil.Process()
buf = np.random.randint(0, 255, (4, 3_000_000), np.uint8)  # 12 MB
print("backend:", jax.default_backend(), flush=True)
r0 = P.memory_info().rss / 1e6
for i in range(50):
    a = jax.device_put(buf)
    b = jax.numpy.sum(a.astype(jax.numpy.float32)).block_until_ready()
    del a, b
    if i % 10 == 9:
        gc.collect()
        print(f"it {i}: rss={P.memory_info().rss / 1e6 - r0:+.0f} MB",
              flush=True)

import sys, gc
sys.path.insert(0, "/root/repo")
import numpy as np, psutil, jax
P = psutil.Process()
buf = np.random.randint(0, 255, (4, 3_000_000), np.uint8)  # 12 MB
print("backend:", jax.default_backend(), flush=True)
r0 = P.memory_info().rss / 1e6
for i in range(50):
    a = jax.device_put(buf)
    b = (jax.numpy.sum(a.astype(jax.numpy.float32))).block_until_ready()
    del a, b
    if i % 10 == 9:
        gc.collect()
        print(f"it {i}: rss={P.memory_info().rss/1e6 - r0:+.0f} MB", flush=True)

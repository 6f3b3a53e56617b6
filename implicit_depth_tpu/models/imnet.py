"""Implicit decoders: IMNet and IEF (iterative error feedback).

Parity: src/models/implicit_net.py:60-152. 4-layer MLP
(inp -> 4g -> 2g -> g -> out, g=imnet_gf=64) with LeakyReLU(0.02); the last
layer is initialized with mean 1e-5 so initial outputs sit near 0; the output
is soft-clamped to ~(0,1) via max(min(x, 0.01x+0.99), 0.01x) unless sigmoid.
IEF starts from offset 0.001, encodes the running offset (1 -> 16), and does
``n_iter`` additive refinement passes through the same MLP.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _normal(std: float = 0.02, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def soft_clamp01(x: jnp.ndarray) -> jnp.ndarray:
    """max(min(x, 0.01x + 0.99), 0.01x) — near-identity in (0,1), slope 0.01 outside."""
    return jnp.maximum(jnp.minimum(x, 0.01 * x + 0.99), 0.01 * x)


class _MLP4(nn.Module):
    gf_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.02)
        x = act(nn.Dense(self.gf_dim * 4, kernel_init=_normal(), dtype=self.dtype)(x))
        x = act(nn.Dense(self.gf_dim * 2, kernel_init=_normal(), dtype=self.dtype)(x))
        x = act(nn.Dense(self.gf_dim * 1, kernel_init=_normal(), dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, kernel_init=_normal(mean=1e-5), dtype=self.dtype)(x)


class IMNet(nn.Module):
    out_dim: int = 1
    gf_dim: int = 64
    use_sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _MLP4(self.gf_dim, self.out_dim, dtype=self.dtype)(x)
        y = y.astype(jnp.float32)
        return nn.sigmoid(y) if self.use_sigmoid else soft_clamp01(y)


class IEF(nn.Module):
    out_dim: int = 1
    gf_dim: int = 64
    n_iter: int = 2
    use_sigmoid: bool = False
    init_offset: float = 0.001
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        offset_enc = nn.Dense(16, kernel_init=_normal(), dtype=self.dtype)
        mlp = _MLP4(self.gf_dim, self.out_dim, dtype=self.dtype)
        offset = jnp.full((*x.shape[:-1], self.out_dim), self.init_offset, jnp.float32)
        for _ in range(self.n_iter):
            feat = offset_enc(offset.astype(self.dtype))
            delta = mlp(jnp.concatenate([x, feat], axis=-1)).astype(jnp.float32)
            offset = offset + delta
        return nn.sigmoid(offset) if self.use_sigmoid else soft_clamp01(offset)

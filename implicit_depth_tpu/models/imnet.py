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
import jax
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

    def setup(self):
        # explicit names keep the param tree identical to the original
        # nn.compact auto-naming (checkpoints / torch importer rely on it)
        self.l0 = nn.Dense(self.gf_dim * 4, kernel_init=_normal(),
                           dtype=self.dtype, name="Dense_0")
        self.l1 = nn.Dense(self.gf_dim * 2, kernel_init=_normal(),
                           dtype=self.dtype, name="Dense_1")
        self.l2 = nn.Dense(self.gf_dim * 1, kernel_init=_normal(),
                           dtype=self.dtype, name="Dense_2")
        self.l3 = nn.Dense(self.out_dim, kernel_init=_normal(mean=1e-5),
                           dtype=self.dtype, name="Dense_3")

    def __call__(self, x):
        act = lambda v: nn.leaky_relu(v, negative_slope=0.02)
        return self.l3(act(self.l2(act(self.l1(act(self.l0(x)))))))

    def tail(self, h1):
        """Layers 2-4 given the post-activation layer-1 output (the IEF
        split-layer-1 fast path)."""
        act = lambda v: nn.leaky_relu(v, negative_slope=0.02)
        return self.l3(act(self.l2(act(self.l1(h1)))))


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

    def setup(self):
        # explicit names reproduce the original nn.compact auto-naming
        # ({"Dense_0": offset_enc, "_MLP4_0": mlp}) for ckpt/importer parity
        self.offset_enc = nn.Dense(16, kernel_init=_normal(), dtype=self.dtype,
                                   name="Dense_0")
        self.mlp = _MLP4(self.gf_dim, self.out_dim, dtype=self.dtype,
                         name="_MLP4_0")

    def __call__(self, x):
        return self.from_parts([x])

    def from_parts(self, parts):
        """IEF over an embedding given as its concat PARTS, layer 1 split by
        part widths: ``concat(parts + [feat]) @ W ≡ Σ part_i @ W_i + feat @
        W_f`` (f32 accumulation per part — the fused kernel's split_l1 trick
        at the flax level). Avoids materializing the (rows, Σc+16) concat per
        refinement iteration (~0.25 ms each at 80k rows, refine-path trace)
        and makes the loop-/iteration-invariant partial products (the
        embedding itself; roi/dir parts across stage-2 iterations) visible to
        XLA's CSE instead of being re-concatenated every call."""
        offset = jnp.full((*parts[0].shape[:-1], self.out_dim),
                          self.init_offset, jnp.float32)
        if self.is_initializing():
            # naive form creates the params with the original concat-input
            # layer-1 shape (Σc+16, 4g)
            x = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
            for _ in range(self.n_iter):
                feat = self.offset_enc(offset.astype(self.dtype))
                delta = self.mlp(
                    jnp.concatenate([x, feat], axis=-1)).astype(jnp.float32)
                offset = offset + delta
            return nn.sigmoid(offset) if self.use_sigmoid else soft_clamp01(offset)
        act = lambda v: nn.leaky_relu(v, negative_slope=0.02)
        d0 = self.variables["params"]["_MLP4_0"]["Dense_0"]
        kernel, b0 = d0["kernel"], d0["bias"].astype(self.dtype)
        # partials stay in compute dtype (matching nn.Dense): f32-typed
        # partial sums at 80k rows traced ~1 ms slower (materialized f32
        # (R, 4g) intermediates)
        dot = lambda a, w: a.astype(self.dtype) @ jnp.asarray(w, self.dtype)
        o, zx = 0, None
        for p in parts:
            t = dot(p, kernel[o:o + p.shape[-1]])
            zx = t if zx is None else zx + t
            o += p.shape[-1]
        kf = kernel[o:]
        for _ in range(self.n_iter):
            feat = self.offset_enc(offset.astype(self.dtype))
            h1 = act(zx + dot(feat, kf) + b0)
            delta = self.mlp.tail(h1).astype(jnp.float32)
            offset = offset + delta
        return nn.sigmoid(offset) if self.use_sigmoid else soft_clamp01(offset)

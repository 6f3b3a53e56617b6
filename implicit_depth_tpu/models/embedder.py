"""NeRF-style positional encoding.

Parity: reference ``Embedder``/``get_embedder``
(src/models/implicit_net.py:9-57): include_input, log-sampled frequencies
2^0..2^(m-1), sin then cos per frequency, concatenated after the input.
multires=8 -> 3 + 3*2*8 = 51 dims; multires_views=4 -> 27.
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(multires: int, input_dims: int = 3, enabled: bool = True) -> int:
    if not enabled or multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int, enabled: bool = True) -> jnp.ndarray:
    """x: (..., D) -> (..., D*(1+2*multires)); identity when disabled."""
    if not enabled or multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)          # (m,)
    xf = x[..., None, :] * freqs[:, None]                        # (..., m, D)
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)   # (..., m, 2D)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)

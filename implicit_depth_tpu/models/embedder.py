"""NeRF-style positional encoding.

Parity: reference ``Embedder``/``get_embedder``
(src/models/implicit_net.py:9-57): include_input, log-sampled frequencies
2^0..2^(m-1), sin then cos per frequency, concatenated after the input.
multires=8 -> 3 + 3*2*8 = 51 dims; multires_views=4 -> 27.

TPU note: the naive form evaluates sin/cos on (..., D)-minor slices — D=3
of the VPU's 128 lanes. Instead, a (D, 2·m·D) power-of-two scale matrix
plus a phase vector (cos x = sin(x + π/2)) packs every transcendental
column into ONE full-lane sin() after a tiny MXU matmul — the measured
decode-path hotspot fix (BASELINE.md). The scale entries are exact powers
of two, so the product is exact under TPU f32 matmul.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def posenc_dim(multires: int, input_dims: int = 3, enabled: bool = True) -> int:
    if not enabled or multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


@functools.lru_cache(maxsize=None)
def _enc_consts(multires: int, d: int):
    """(d, 2·m·d) scale matrix and (2·m·d,) phase: columns ordered per
    frequency as [sin(x·2^j) (d) | cos(x·2^j) (d)], matching the reference
    Embedder layout."""
    n = 2 * multires * d
    smat = np.zeros((d, n), np.float32)
    phase = np.zeros((n,), np.float32)
    c = 0
    for j in range(multires):
        for ph in (0.0, np.pi / 2):
            for k in range(d):
                smat[k, c] = 2.0 ** j
                phase[c] = ph
                c += 1
    return smat, phase


def positional_encoding(x: jnp.ndarray, multires: int, enabled: bool = True) -> jnp.ndarray:
    """x: (..., D) -> (..., D*(1+2*multires)); identity when disabled."""
    if not enabled or multires <= 0:
        return x
    smat, phase = _enc_consts(multires, x.shape[-1])
    trig = jnp.sin(jnp.asarray(x, jnp.float32) @ jnp.asarray(smat)
                   + jnp.asarray(phase))
    return jnp.concatenate([x, trig.astype(x.dtype)], axis=-1)

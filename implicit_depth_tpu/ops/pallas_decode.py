"""Fused per-pair implicit decode — Pallas TPU kernel.

The FLOPs hot spot of the pipeline (SURVEY.md §3.3 stage 8): for every
compacted ray/voxel pair, build the 385-d embedding
[voxel_feat(128) | roi_rgb(128) | posenc(enter)(51) | posenc(leave)(51) |
posenc(dir)(27)] and run two implicit MLPs — the IEF offset decoder
(2 iterations of 401->256->128->64->1) and the IMNet termination-probability
decoder (385->256->128->64->1).

The XLA path materializes the (P, 385) embedding and each layer's
activations in HBM; this kernel keeps everything in VMEM per tile: the
positional encodings are computed in-register from the raw 3-d positions,
all weights (~0.6 MB bf16) stay resident, and only the two output scalars
per pair leave the chip. bf16 MXU matmuls with f32 accumulation.

Weight layout (dict of arrays, bf16 or f32):
  off_enc_w (1,16)  off_enc_b (16,)
  off_w1 (401,4g) off_b1 … off_w4 (g,1) off_b4
  prob_w1 (385,4g) prob_b1 … prob_w4 (g,1) prob_b4
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY = 0.02


def _posenc(x, multires: int):
    """[x | sin(2^j x) | cos(2^j x)] over the last axis (matches
    models/embedder.py layout: per-freq sin block then cos block)."""
    parts = [x]
    for j in range(multires):
        f = np.float32(2.0 ** j)
        parts.append(jnp.concatenate([jnp.sin(x * f), jnp.cos(x * f)], -1))
    return jnp.concatenate(parts, -1)


def _mlp4(x, w, prefix: str, dtype):
    """Intermediate activations stay in ``dtype`` (bf16) BETWEEN layers
    (materializing f32 activation tensors doubles HBM traffic for zero
    accuracy benefit), but every matmul requests an f32 accumulator —
    Mosaic rejects non-32-bit matmul accs ('Expected matmul acc to be
    32-bit'); the acc lives in registers, so this costs nothing."""
    act = lambda v: jnp.where(v > 0, v, LEAKY * v)
    h = x
    for i in (1, 2, 3):
        h = act(jax.lax.dot_general(
            h.astype(dtype), w[f"{prefix}_w{i}"].astype(dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            + w[f"{prefix}_b{i}"].astype(jnp.float32)).astype(dtype)
    return (jax.lax.dot_general(
        h.astype(dtype), w[f"{prefix}_w4"].astype(dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + w[f"{prefix}_b4"])


def _soft_clamp(x):
    return jnp.maximum(jnp.minimum(x, 0.01 * x + 0.99), 0.01 * x)


def _decode_tile(pair_vox, roi, enter, leave, dir_e, w,
                 *, multires: int, n_iter: int, init_offset: float,
                 use_sigmoid: bool, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp tile computation shared by the kernel body and the XLA
    reference (guarantees bit-comparable semantics between both paths).

    IEF layer-1 hoisting: the (P, 385) embed part of the iteration input is
    constant across iterations, so ``embed @ W1[:385]`` is computed once; the
    changing part is the encoded scalar offset, whose whole
    ``offset -> enc(16) -> W1[385:]`` chain collapses to one rank-1 update
    ``offset @ (off_enc_w @ W1[385:])`` plus a constant row. Numerically a
    reassociation of the same sum (saves n_iter−1 full first-layer passes —
    ~25% of decode FLOPs at n_iter=2).
    """
    enter_e = _posenc(enter, multires)
    leave_e = _posenc(leave, multires)
    embed = jnp.concatenate([pair_vox, roi, enter_e, leave_e, dir_e],
                            -1).astype(dtype)
    t, d_embed = embed.shape
    act = lambda v: jnp.where(v > 0, v, LEAKY * v)
    # every matmul accumulates f32 (Mosaic requires 32-bit matmul accs);
    # activations are cast back to ``dtype`` between layers
    dot = lambda a, b, out=None: jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    w1 = w["off_w1"]
    e1 = dot(embed, w1[:d_embed], jnp.float32) + w["off_b1"]     # (P, 4g) once
    a_vec = dot(w["off_enc_w"], w1[d_embed:], jnp.float32)       # (1, 4g)
    c_vec = dot(w["off_enc_b"][None, :], w1[d_embed:], jnp.float32)[0]

    offset = jnp.full((t, 1), init_offset, jnp.float32)
    for _ in range(n_iter):
        h = act(e1 + offset * a_vec + c_vec).astype(dtype)
        h = act(dot(h, w["off_w2"]) + w["off_b2"].astype(dtype))
        h = act(dot(h, w["off_w3"]) + w["off_b3"].astype(dtype))
        offset = offset + dot(h, w["off_w4"], jnp.float32) + w["off_b4"]
    logit = _mlp4(embed, w, "prob", dtype)
    squash = jax.nn.sigmoid if use_sigmoid else _soft_clamp
    return squash(offset)[:, 0], squash(logit)[:, 0]


def fused_pair_decode(pair_vox: jnp.ndarray, roi: jnp.ndarray,
                      enter: jnp.ndarray, leave: jnp.ndarray,
                      dir_e: jnp.ndarray, weights: Dict[str, jnp.ndarray],
                      *, multires: int = 8, n_iter: int = 2,
                      init_offset: float = 0.001, use_sigmoid: bool = False,
                      dtype=jnp.bfloat16, tile: int = 512,
                      interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(P, …) compacted pair features -> (offset (P,), prob_logit (P,)).

    Per-pair features travel as one packed bf16 block (pair_vox | roi |
    dir_e) plus a small f32 block for the raw positions (posenc at 2^7 needs
    f32 phase precision) — two input DMAs per tile keep grid-step overhead
    small; weights stay VMEM-resident in ``dtype``.
    """
    p = pair_vox.shape[0]
    packed = jnp.concatenate([pair_vox, roi, dir_e], axis=-1).astype(dtype)
    pos = jnp.concatenate([enter, leave, jnp.zeros_like(enter[:, :2])],
                          axis=-1).astype(jnp.float32)        # (P, 8)
    cols = packed.shape[1]
    c_pv, c_roi, c_de = pair_vox.shape[1], roi.shape[1], dir_e.shape[1]
    pad = (-p) % tile
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
    n_tiles = (p + pad) // tile

    wkeys = sorted(weights)
    warrs = [jnp.atleast_2d(weights[k]).astype(
        jnp.float32 if k.endswith(("_b1", "_b2", "_b3", "_b4", "enc_b"))
        else dtype) for k in wkeys]

    def kernel(x_ref, pos_ref, *rest):
        wrefs, (off_ref, logit_ref) = rest[:-2], rest[-2:]
        w = {k: r[0] if weights[k].ndim == 1 else r[:]
             for k, r in zip(wkeys, wrefs)}
        x = x_ref[:]
        ps = pos_ref[:]
        o = c_pv + c_roi
        off, logit = _decode_tile(
            x[:, :c_pv], x[:, c_pv:o],
            ps[:, 0:3], ps[:, 3:6],
            x[:, o:o + c_de], w,
            multires=multires, n_iter=n_iter, init_offset=init_offset,
            use_sigmoid=use_sigmoid, dtype=dtype)
        off_ref[:] = off[:, None]
        logit_ref[:] = logit[:, None]

    w_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for a in warrs]
    out_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    gf4 = weights["off_w1"].shape[1]
    flops = 2 * (p + pad) * (
        n_iter * (weights["off_w1"].shape[0] * gf4 + gf4 * gf4 // 2
                  + (gf4 // 2) * (gf4 // 4) + gf4 // 4)
        + weights["prob_w1"].shape[0] * gf4 + gf4 * gf4 // 2
        + (gf4 // 2) * (gf4 // 4) + gf4 // 4)

    off, logit = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM), *w_specs],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((p + pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((p + pad, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(p + pad) * cols * 2,
            transcendentals=(p + pad) * 6 * 2 * multires),
        interpret=interpret,
    )(packed, pos, *warrs)
    return off[:p, 0], logit[:p, 0]


def xla_pair_decode(pair_vox, roi, enter, leave, dir_e, weights,
                    *, multires: int = 8, n_iter: int = 2,
                    init_offset: float = 0.001, use_sigmoid: bool = False,
                    dtype=jnp.bfloat16):
    """Reference path: identical math, plain XLA. Used as the correctness
    oracle for the kernel and as the CPU fallback."""
    return _decode_tile(pair_vox, roi, enter, leave, dir_e, weights,
                        multires=multires, n_iter=n_iter,
                        init_offset=init_offset, use_sigmoid=use_sigmoid,
                        dtype=dtype)

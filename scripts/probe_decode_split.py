#!/usr/bin/env python
"""Decompose the stage-1 serving decode kernel's time: MXU passes vs posenc
transcendentals vs lane-unpack selects.

The fused kernel is one custom-call — the trace can't see inside it. This
ablates each in-kernel component by monkeypatching the module helpers
(`_trig_block` -> no-sin / constant, `_sel_cols` -> zeros) and
re-timing the standalone kernel at production shapes, interleaved A/B.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_decode_split.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import implicit_depth_tpu.ops.pallas_ray_decode as prd
from implicit_depth_tpu.utils.profiling import device_slope_time

N_RAYS, KB, CV, CRAY, TILE = 80_000, 8, 128, 155, 128


def _weights(rng, c_embed):
    g = 256
    dims = [(c_embed + 16, g), (g, g // 2), (g // 2, g // 4), (g // 4, 1)]
    w = {"off_enc_w": rng.normal(size=(1, 16)).astype(np.float32),
         "off_enc_b": rng.normal(size=(16,)).astype(np.float32)}
    for i, (a, b) in enumerate(dims, 1):
        w[f"off_w{i}"] = (rng.normal(size=(a, b)) * 0.05).astype(np.float32)
        w[f"off_b{i}"] = (rng.normal(size=(b,)) * 0.05).astype(np.float32)
        ap = a if i > 1 else c_embed
        w[f"prob_w{i}"] = (rng.normal(size=(ap, b)) * 0.05).astype(np.float32)
        w[f"prob_b{i}"] = (rng.normal(size=(b,)) * 0.05).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in w.items()}


def pe_nosin(pos6, smat, phase):
    """Same shapes/matmul as _trig_block, sin() removed."""
    return jax.lax.dot_general(pos6, smat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + phase


def pe_const(pos6, smat, phase):
    """No trig block at all: broadcast a constant (keeps the shape)."""
    return jnp.full((pos6.shape[0], smat.shape[1]), 0.25, jnp.float32)


_real_sel = prd._sel_cols


def sel_zeros(blk, t, kb, stride, offs):
    z = jnp.zeros((t * kb, 1), blk.dtype) + blk[0, 0]
    return [z for _ in offs]


def main():
    rng = np.random.default_rng(17)
    c_embed = CV + 128 + 102 + 27
    w = _weights(rng, c_embed)
    pair_vox = jnp.asarray(
        rng.normal(size=(N_RAYS * KB, CV)).astype(np.float32), jnp.bfloat16)
    pos = jnp.asarray((rng.normal(size=(N_RAYS, KB * 6)) * 0.5)
                      .astype(np.float32))
    ray_feat = jnp.asarray(
        rng.normal(size=(N_RAYS, CRAY)).astype(np.float32), jnp.bfloat16)
    key = jax.random.key(0)

    def run(n_iter=2):
        # call _fused_fwd_impl directly (not the custom_vjp wrapper) so each
        # variant re-traces with the patched helpers instead of hitting the
        # custom_vjp's jaxpr cache
        def fn(k, pv, po, rf):
            po = po + 0 * jax.random.uniform(k, (1,), po.dtype)
            off, logit = prd._fused_fwd_impl(
                pv, po, rf, w, KB, 8, n_iter, 0.001, False, jnp.bfloat16,
                TILE, False)
            return (jnp.abs(off).sum() + jnp.abs(logit).sum()).astype(
                jnp.float32)
        return fn

    variants = {}
    variants["full"] = (None, None, 2)
    variants["no_sin"] = (pe_nosin, None, 2)
    variants["no_posenc"] = (pe_const, None, 2)
    variants["no_unpack"] = (pe_const, sel_zeros, 2)
    variants["ief1"] = (None, None, 1)
    variants["ief0"] = (None, None, 0)

    real_pe = prd._trig_block
    for rep in range(3):
        for name, (pe, sel, n_iter) in variants.items():
            prd._trig_block = pe or real_pe
            prd._sel_cols = sel or _real_sel
            try:
                ms = device_slope_time(run(n_iter), key, pair_vox, pos,
                                       ray_feat) * 1e3
            finally:
                prd._trig_block = real_pe
                prd._sel_cols = _real_sel
            print(f"rep{rep} {name:12s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

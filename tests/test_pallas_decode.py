"""Fused Pallas pair decode vs the flax decoder modules (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.models.embedder import positional_encoding
from implicit_depth_tpu.models.imnet import IEF, IMNet
from implicit_depth_tpu.ops.pallas_decode import fused_pair_decode, xla_pair_decode

P, GF = 160, 16
DIMS = dict(vox=32, roi=32, dir=27)
EMBED = DIMS["vox"] + DIMS["roi"] + 51 + 51 + DIMS["dir"]


def _inputs(rng):
    return (rng.normal(size=(P, DIMS["vox"])).astype(np.float32),
            rng.normal(size=(P, DIMS["roi"])).astype(np.float32),
            rng.normal(scale=0.5, size=(P, 3)).astype(np.float32),
            rng.normal(scale=0.5, size=(P, 3)).astype(np.float32),
            rng.normal(size=(P, DIMS["dir"])).astype(np.float32))


def _flax_reference(rng):
    """Init the real flax decoders and pull their weights into kernel layout."""
    ief = IEF(out_dim=1, gf_dim=GF, n_iter=2)
    prob = IMNet(out_dim=1, gf_dim=GF)
    x = jnp.zeros((1, EMBED))
    xi = jnp.zeros((1, EMBED + 16))
    ief_vars = ief.init(jax.random.key(0), x)
    prob_vars = prob.init(jax.random.key(1), x)
    w = {"off_enc_w": ief_vars["params"]["Dense_0"]["kernel"],
         "off_enc_b": ief_vars["params"]["Dense_0"]["bias"]}
    for i in range(4):
        w[f"off_w{i + 1}"] = ief_vars["params"]["_MLP4_0"][f"Dense_{i}"]["kernel"]
        w[f"off_b{i + 1}"] = ief_vars["params"]["_MLP4_0"][f"Dense_{i}"]["bias"]
        w[f"prob_w{i + 1}"] = prob_vars["params"]["_MLP4_0"][f"Dense_{i}"]["kernel"]
        w[f"prob_b{i + 1}"] = prob_vars["params"]["_MLP4_0"][f"Dense_{i}"]["bias"]
    return ief, prob, ief_vars, prob_vars, w


def test_xla_decode_matches_flax(rng):
    pv, roi, en, lv, de = map(jnp.asarray, _inputs(rng))
    ief, prob, ief_vars, prob_vars, w = _flax_reference(rng)

    embed = jnp.concatenate([
        pv, roi, positional_encoding(en, 8), positional_encoding(lv, 8), de], -1)
    want_off = ief.apply(ief_vars, embed)[:, 0]
    want_logit = prob.apply(prob_vars, embed)[:, 0]

    got_off, got_logit = xla_pair_decode(pv, roi, en, lv, de, w,
                                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_off), np.asarray(want_off), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logit), np.asarray(want_logit), atol=1e-5)


def test_pallas_kernel_matches_xla(rng):
    pv, roi, en, lv, de = map(jnp.asarray, _inputs(rng))
    *_, w = _flax_reference(rng)
    want = xla_pair_decode(pv, roi, en, lv, de, w, dtype=jnp.float32)
    got = fused_pair_decode(pv, roi, en, lv, de, w, dtype=jnp.float32,
                            tile=64, interpret=True)
    for g, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(ww), atol=1e-5)


def test_pallas_kernel_padding(rng):
    """P not divisible by tile: padded rows must not corrupt real outputs."""
    pv, roi, en, lv, de = map(jnp.asarray, _inputs(rng))
    *_, w = _flax_reference(rng)
    a = fused_pair_decode(pv, roi, en, lv, de, w, dtype=jnp.float32,
                          tile=128, interpret=True)
    b = fused_pair_decode(pv, roi, en, lv, de, w, dtype=jnp.float32,
                          tile=160, interpret=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)

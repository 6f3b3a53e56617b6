"""Ray-major fused implicit decode — Pallas TPU kernel (round-2 hot path).

Replaces the pair-compacted kernel (ops/pallas_decode.py) for the
``pairs_budget_mode='per_ray'`` layout: the DDA pair slots are t-sorted and
front-packed (ops/ray_grid.py), so decoding the first ``Kb`` slots of every
ray is a DENSE (N_rays, Kb) computation with zero gathers:

  * per-PAIR inputs (voxel feature rows, enter/exit positions) arrive
    contiguously as (N_rays·Kb, C) blocks — plain sequential DMA;
  * per-RAY inputs (ROI RGB feature + encoded view direction, 155 cols)
    arrive once per ray and are broadcast over the Kb slots **inside** the
    kernel — an HBM-traffic and FLOP reduction the (P, 385) materialized
    layout can't express: layer 1 of both decoders is split into a pair part
    ([vox | posenc(enter) | posenc(leave)] rows) and a ray part
    ([roi | dir_e] rows) computed once per ray (T×155·4g vs T·Kb×155·4g);
  * positional encodings are computed in-register from the raw 3-d
    positions (the XLA path materializes lane-padded (P, 3) sin/cos chains —
    the measured per-pair overhead hotspot, BASELINE.md);
  * all MLP weights (~0.6 MB bf16) stay VMEM-resident across the grid.

Embedding layout parity (pipeline.py:431-433): the logical embed is
[vox(Cv) | roi(128) | enter_e(51) | leave_e(51) | dir_e(27)]; the caller
passes full layer-1 matrices and ``split_l1`` reorders rows into the
pair/ray parts — a pure reindexing, numerically identical.

Training: ``fused_ray_decode`` ships a custom VJP with two backends
(``bwd_impl``): 'xla' re-runs the identical-math XLA path under ``jax.vjp``
(exact grads, pays one XLA forward), 'kernel' runs the fused backward
kernel — per-tile forward recompute in VMEM (activations never touch HBM)
followed by backprop of both MLPs, with weight-grad accumulators held in
constant-index VMEM output blocks across the sequential grid.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY = 0.02

# off|prob layer-1 width pack: one 2·4g-wide layer-1 chain instead of two
# 4g chains over identical inputs (VERDICT r3 #4). Bit-identical output
# (per-column accumulation unchanged). Interleaved A/B
# (scripts/bench_pack_ab.sh, 3 reps, BASELINE.md round 4): serving fwd
# 12.81 vs 12.95 ms median (packed faster 3/3 reps, ~1%); TRUE-serial
# train step 38.58 vs 38.27 ms (wash, spreads overlap). Defaults follow
# the measurement: packed for the SERVING forward (custom-VJP fwd rules
# flag train=True), unpacked for the training fwd+bwd.
# IDT_DECODE_PACK_L1=0/1 forces BOTH paths for A/Bs; read ONCE at module
# import — set it before importing jax/this package.
_PACK_ENV = os.environ.get("IDT_DECODE_PACK_L1")
PACK_L1_SERVE = _PACK_ENV == "1" if _PACK_ENV is not None else True
PACK_L1_TRAIN = _PACK_ENV == "1" if _PACK_ENV is not None else False


def _soft_clamp(x):
    """max(min(x, 0.01x + 0.99), 0.01x) — the reference decoders' output
    squash (implicit_net.py:96; models/imnet.py soft_clamp01). One shared
    copy for every kernel path so the parity-critical constants cannot
    drift between them."""
    return jnp.maximum(jnp.minimum(x, 0.01 * x + 0.99), 0.01 * x)


def _posenc_consts(multires: int):
    """Lane-packing constants for the pair posenc: S (6, 12·multires) and
    phase (12·multires,) such that ``sin(pos6 @ S + phase)`` emits every
    sin/cos column of both positions' encodings in embedder layout order
    (per freq: sin block then cos block; cos x = sin(x + π/2)).

    Why: sin/cos on (rows, 3) slices uses 3 of the VPU's 128 lanes — the
    measured per-pair decode hotspot (BASELINE.md). One small MXU matmul
    packs all 12·multires transcendental columns into a single full-lane
    sin() pass. S has one power-of-two entry per column, so the product is
    exact even under bf16-split f32 matmul."""
    n = 12 * multires
    smat = np.zeros((6, n), np.float32)
    phase = np.zeros((n,), np.float32)
    c = 0
    for base in (0, 3):
        for j in range(multires):
            for ph in (0.0, np.pi / 2):
                for d in range(3):
                    smat[base + d, c] = 2.0 ** j
                    phase[c] = ph
                    c += 1
    return smat, phase


def _trig_block(pos6, smat, phase):
    """(rows, 6) f32 raw positions -> (rows, 12·multires) f32 sin/cos block
    in ``_posenc_consts`` column order: one power-of-two scale matmul + a
    single full-lane sin() (cos via the +π/2 phase). The raw positions and
    this block are the ONLY pe tensors the decode ever builds — layer 1 is
    split over [vox | pos6 | trig] rows so the (rows, 102) encoding and the
    pair_in concat never materialize (module-level hook so
    scripts/probe_decode_split.py can ablate it)."""
    return jnp.sin(jax.lax.dot_general(
        pos6, smat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + phase)


def pack_pair_pos(enter, leave):
    """(..., kb, 3) enter/leave positions -> ray-major packed (..., kb·6)
    f32 with column layout j·6+d = slot j's [enter xyz | leave xyz][d].

    Why ray-major packing: a flat (N·kb, c) tensor with c < 128 crossing the
    Pallas custom-call boundary is materialized in the TPU's (8, 128) tiled
    layout — 128/c lanes of padding per row (a (651264, 8) f32 pos tensor
    measured 333 MB / 0.56 ms per materialization; the (N·kb, 1) cell-id and
    cotangent columns 0.51 ms EACH). Packing the per-pair scalars along the
    lane dimension of a per-RAY row makes the buffers lane-dense; the kernel
    unpacks with iota-mask selects in VMEM (``_sel_cols``)."""
    kb = enter.shape[-2]
    both = jnp.concatenate([enter, leave], axis=-1)          # (..., kb, 6)
    return both.reshape(*both.shape[:-2], kb * 6).astype(jnp.float32)


def _sel_cols(blk, t, kb, stride, offs):
    """Unpack per-pair columns from a ray-major packed block.

    blk: (t, width) where row i packs ray i's kb slots at columns
    j·stride + off. Returns [(t·kb, 1), ...] — one column per ``off`` —
    with out[i·kb + j] = blk[i, j·stride + off]. Pure VPU work (broadcast +
    iota compare + lane reduce); avoids the (rows, 1) lane-padded HBM
    layout AND any in-kernel sublane<->lane relayout."""
    rows = t * kb
    width = blk.shape[1]
    b3 = jnp.broadcast_to(blk.reshape(t, 1, width),
                          (t, kb, width)).reshape(rows, width)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    base = jax.lax.rem(row, kb) * stride
    zero = jnp.zeros((), blk.dtype)
    return [jnp.sum(jnp.where(lane == base + off, b3, zero),
                    axis=1, keepdims=True) for off in offs]


def _pack_slots(vals, t, kb):
    """(t·kb, 1) per-pair column -> (t, kb) ray-major packed block (the
    inverse of ``_sel_cols``): out[i, j] = vals[i·kb + j]. Spread onto a
    slot-matched lane then reduce each ray's kb sublanes — the same rank-3
    axis-1 reduce the backward kernel already uses for d_re_off."""
    rows = t * kb
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, kb), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, kb), 0)
    spread = jnp.where(lane == jax.lax.rem(row, kb), vals, 0.0)
    return jnp.sum(spread.reshape(t, kb, kb), axis=1)


def split_l1(w1: jnp.ndarray, c_vox: int, c_roi: int, c_pos: int, c_dir: int):
    """Split a layer-1 kernel (in_dim, out) over the embed layout
    [vox | roi | pos | dir (+ extra rows e.g. IEF offset-enc)] into
    (pair_rows = vox+pos+extra, ray_rows = roi+dir)."""
    o1 = c_vox
    o2 = o1 + c_roi
    o3 = o2 + c_pos
    o4 = o3 + c_dir
    w_pair = jnp.concatenate([w1[:o1], w1[o2:o3], w1[o4:]], axis=0)
    w_ray = jnp.concatenate([w1[o1:o2], w1[o3:o4]], axis=0)
    return w_pair, w_ray


def _save_layout(save_mode, g, g2, g3, c_tr, n_iter, dtype):
    """[(name, cols, dtype), ...] of the activations the forward saves for
    the training backward. 'l1': the two layer-1 pre-activations (skips the
    two big layer-1 matmuls in the backward recompute) plus the trig block
    (the backward needs it only for the layer-1 trig weight grads — saving
    the (rows, 12·multires) bf16 block skips the ~61M-sin recompute, the
    measured 1-1.8 ms kernel hotspot, for ~0.25 GB of HBM round-trip).
    'all': additionally every h2/h3 and the (rows, 1) pre-squash
    offsets/logit — the backward then recomputes NO matmuls at all (h1 is
    elementwise from e1), trading ~0.75 GB of extra bf16 HBM round-trip for
    ~157 GFLOP of recompute at production shapes."""
    if save_mode == "l1":
        return [("e1", g, dtype), ("z1p", g, dtype), ("trig", c_tr, dtype)]
    if save_mode == "all":
        lay = [("e1", g, dtype), ("z1p", g, dtype), ("trig", c_tr, dtype)]
        for i in range(n_iter):
            lay += [(f"off{i}", 1, jnp.float32),
                    (f"h2_{i}", g2, dtype), (f"h3_{i}", g3, dtype)]
        lay += [("off_fin", 1, jnp.float32), ("h2p", g2, dtype),
                ("h3p", g3, dtype), ("logit", 1, jnp.float32)]
        return lay
    return []


def _decode_rows(pair_vox, pos6, ray_e1_off, ray_e1_prob, w, kb,
                 *, n_iter, init_offset, use_sigmoid, dtype,
                 save_mode=None):
    """Shared tile math. pair_vox (rows, Cv) ``dtype``; pos6 (rows, 6) f32
    raw [enter xyz | leave xyz]; ray_e1_* (rows/kb, 4g) f32 (per-ray layer-1
    partials); w: split weights. Returns (offset (rows,), logit (rows,))
    f32; with ``save_mode`` also a dict of saved activations
    (``_save_layout``) for the save-mode training backwards.

    The positional encoding is never materialized: layer 1 is split over the
    embed's [vox | pos6 | trig] parts (a pure row reindex of W1 —
    ``_prep_weights``), so only the (rows, 12·multires) sin() block is
    computed and the pe/pair_in concats disappear. The concat+cast chain was
    the measured kernel hotspot: posenc-minus-sin alone cost ~1.7 ms of the
    5.5 ms serving kernel (scripts/probe_decode_split.py)."""
    rows = pair_vox.shape[0]
    act = lambda v: jnp.where(v > 0, v, LEAKY * v)
    # Mosaic requires 32-bit matmul accumulation ('Expected matmul acc to be
    # 32-bit'); inputs stay in ``dtype``, accumulators in f32
    dot = lambda a, b, out=None: jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    trig = _trig_block(pos6, w["pe_smat"], w["pe_phase"])

    def pair_l1(pre):  # Σ part_i @ W1_part_i over [vox | pos6 | trig]
        return (dot(pair_vox, w[f"{pre}v_w1"])
                + dot(pos6, w[f"{pre}p6_w1"])
                + dot(trig, w[f"{pre}tr_w1"]))

    def bcast(ray_part):  # (rows/kb, 4g) -> (rows, 4g)
        t = ray_part.shape[0]
        g4 = ray_part.shape[1]
        return jnp.broadcast_to(ray_part.reshape(t, 1, g4),
                                (t, kb, g4)).reshape(rows, g4)

    saves = {"trig": trig}

    if "lv_w1" in w:
        # off|prob width pack (VERDICT r3 #4): the two decoders' layer-1
        # part-matmuls run over IDENTICAL inputs — pack their kernels along
        # the output dim into one 2·4g-wide chain (halves the count of small
        # matmuls and reads vox/pos6/trig operands once). ray_e1_off here is
        # the PACKED (rows/kb, 2·4g) per-ray partial (lr_w1); per-column
        # accumulation order is unchanged, so the slices are bit-identical
        # to the unpacked path.
        both = (dot(pair_vox, w["lv_w1"]) + dot(pos6, w["lp6_w1"])
                + dot(trig, w["ltr_w1"]) + bcast(ray_e1_off) + w["l_b1"])
        g4 = both.shape[1] // 2
        e1_off, z1p = both[:, :g4], both[:, g4:]
    else:
        e1_off = pair_l1("off") + bcast(ray_e1_off) + w["off_b1"]
        z1p = pair_l1("prob") + bcast(ray_e1_prob) + w["prob_b1"]

    # --- offset decoder (IEF, layer-1 hoisted across iterations) ----------
    a_vec = dot(w["off_enc_w"], w["offx_w1"], jnp.float32)       # (1, 4g)
    c_vec = dot(w["off_enc_b"][None, :], w["offx_w1"], jnp.float32)[0]
    offset = jnp.full((rows, 1), init_offset, jnp.float32)
    for i in range(n_iter):
        saves[f"off{i}"] = offset
        h = act(e1_off + offset * a_vec + c_vec).astype(dtype)
        h2 = act(dot(h, w["off_w2"]) + w["off_b2"].astype(dtype))
        h3 = act(dot(h2, w["off_w3"]) + w["off_b3"].astype(dtype))
        saves[f"h2_{i}"], saves[f"h3_{i}"] = h2, h3
        offset = offset + dot(h3, w["off_w4"], jnp.float32) + w["off_b4"]

    # --- termination-probability decoder (IMNet) ---------------------------
    h = act(z1p).astype(dtype)
    h2p = act(dot(h, w["prob_w2"]) + w["prob_b2"].astype(dtype))
    h3p = act(dot(h2p, w["prob_w3"]) + w["prob_b3"].astype(dtype))
    logit = dot(h3p, w["prob_w4"], jnp.float32) + w["prob_b4"]

    sq = jax.nn.sigmoid if use_sigmoid else _soft_clamp
    if save_mode:
        saves.update(e1=e1_off, z1p=z1p, off_fin=offset,
                     h2p=h2p, h3p=h3p, logit=logit)
        return sq(offset)[:, 0], sq(logit)[:, 0], saves
    return sq(offset)[:, 0], sq(logit)[:, 0]


def _prep_weights(weights: Dict[str, jnp.ndarray], c_vox: int, c_roi: int,
                  c_pos: int, c_dir: int, dtype, pack_l1: bool = False):
    """Reorganize the pipeline weight dict (ops/pallas_decode.py layout) into
    the split pair/ray form this kernel consumes. The pair part is further
    split over the pe layout [enter3 | trigE | leave3 | trigL] into raw-pos6
    rows and trig rows so the posenc never materializes (``_decode_rows``).

    ``pack_l1``: additionally pack the off|prob layer-1 kernels along the
    output dim (lv/lp6/ltr/lr_w1 + l_b1) and drop the unpacked pair keys —
    the forward then runs one 2·4g-wide layer-1 chain (``_decode_rows``)."""
    offp, offr = split_l1(weights["off_w1"], c_vox, c_roi, c_pos, c_dir)
    # IEF w1 carries 16 extra offset-enc rows at the END of the input dim;
    # keep them separate (offx) — they multiply the encoded running offset.
    n_extra = weights["off_w1"].shape[0] - (c_vox + c_roi + c_pos + c_dir)
    offx = offp[-n_extra:] if n_extra else offp[:0]
    offp = offp[:offp.shape[0] - n_extra] if n_extra else offp
    probp, probr = split_l1(weights["prob_w1"], c_vox, c_roi, c_pos, c_dir)
    multires = (c_pos // 6 - 1) // 2
    half = c_pos // 2  # 3 + 6·multires per position

    def split_pe(pair_w):
        """(c_vox+c_pos, g) -> vox rows, pos6 rows (6, g), trig rows."""
        v, pe = pair_w[:c_vox], pair_w[c_vox:]
        p6 = jnp.concatenate([pe[0:3], pe[half:half + 3]], axis=0)
        tr = jnp.concatenate([pe[3:half], pe[half + 3:]], axis=0)
        return v, p6, tr

    offv, offp6, offtr = split_pe(offp)
    probv, probp6, probtr = split_pe(probp)
    smat, phase = _posenc_consts(multires)
    w = {
        "offv_w1": offv, "offp6_w1": offp6, "offtr_w1": offtr,
        "offr_w1": offr, "offx_w1": offx,
        "probv_w1": probv, "probp6_w1": probp6, "probtr_w1": probtr,
        "probr_w1": probr,
        "off_enc_w": weights["off_enc_w"], "off_enc_b": weights["off_enc_b"],
        "pe_smat": smat, "pe_phase": phase,
    }
    for p in ("off", "prob"):
        for i in (1, 2, 3, 4):
            w[f"{p}_b{i}"] = weights[f"{p}_b{i}"]
            if i > 1:
                w[f"{p}_w{i}"] = weights[f"{p}_w{i}"]
    if pack_l1:
        for part in ("v", "p6", "tr", "r"):
            w[f"l{part}_w1"] = jnp.concatenate(
                [w.pop(f"off{part}_w1"), w.pop(f"prob{part}_w1")], axis=1)
        w["l_b1"] = jnp.concatenate([w.pop("off_b1"), w.pop("prob_b1")])
    cast = lambda k, a: (jnp.asarray(a, jnp.float32)
                         if k.endswith(("_b1", "_b2", "_b3", "_b4", "enc_b"))
                         or k.startswith("pe_")
                         else jnp.asarray(a, dtype))
    return {k: cast(k, a) for k, a in w.items()}


def xla_ray_decode(pair_vox: jnp.ndarray, pos: jnp.ndarray,
                   ray_feat: jnp.ndarray, weights: Dict[str, jnp.ndarray],
                   *, kb: int, multires: int = 8, n_iter: int = 2,
                   init_offset: float = 0.001, use_sigmoid: bool = False,
                   dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Identical math, plain XLA — the kernel's correctness oracle, CPU
    fallback, and the recompute path for the custom VJP backward.

    pair_vox: (N·kb, Cv); pos: (N·kb, >=6) f32 [enter xyz | leave xyz];
    ray_feat: (N, Cr).
    """
    c_vox = pair_vox.shape[1]
    c_ray = ray_feat.shape[1]
    c_pos = 6 * (1 + 2 * multires)
    w = _prep_weights(weights, c_vox, c_ray - 27, c_pos, 27, dtype)
    dot = lambda a, b: jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ray_e1_off = dot(ray_feat, w["offr_w1"])
    ray_e1_prob = dot(ray_feat, w["probr_w1"])
    return _decode_rows(pair_vox.astype(dtype), pos[:, :6].astype(jnp.float32),
                        ray_e1_off, ray_e1_prob,
                        w, kb, n_iter=n_iter, init_offset=init_offset,
                        use_sigmoid=use_sigmoid, dtype=dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def fused_ray_decode(pair_vox, pos, ray_feat, weights,
                     kb, multires=8, n_iter=2, init_offset=0.001,
                     use_sigmoid=False, dtype=jnp.bfloat16,
                     rays_per_tile=256, interpret=False, bwd_impl="xla"):
    """(N·kb, Cv) pair features + (N, kb·6) packed positions
    (``pack_pair_pos``) + (N, Cr) ray features -> (offset, prob_logit),
    each (N, kb) f32 ray-major. See module docstring.

    ``bwd_impl``: 'xla' re-runs the identical-math XLA path under jax.vjp in
    the backward (exact, but pays a full XLA forward); 'kernel' runs the
    fused backward kernel (per-tile forward recompute in VMEM + backprop,
    weight-grad accumulators VMEM-resident across the grid)."""
    return _fused_fwd_impl(pair_vox, pos, ray_feat, weights, kb, multires,
                           n_iter, init_offset, use_sigmoid, dtype,
                           rays_per_tile, interpret)


def _pos_rows(pos_rk, kb):
    """(N, kb·6) packed positions -> (N·kb, 6) rows (free reshape) for the
    XLA oracle paths."""
    n = pos_rk.shape[0]
    return pos_rk.reshape(n * kb, 6)


def _fused_fwd_impl(pair_vox, pos, ray_feat, weights, kb, multires, n_iter,
                    init_offset, use_sigmoid, dtype, rays_per_tile, interpret,
                    *, cell_ids=None, vox_table=None, tiles_per_image=None,
                    save_mode=None, train=False):
    """``pair_vox`` holds gathered (N·kb, Cv) rows — OR pass
    ``cell_ids`` (N, kb) ray-major local ids + ``vox_table`` (n_cells, Cv)
    and the lookup happens IN-kernel as a one-hot MXU matmul per tile
    (pair_vox then ignored): TPU per-row gathers from HBM are the measured
    decode bottleneck, while a (rows, n_cells) one-hot against the
    VMEM-resident table is MXU work.

    ``pos``: (N, kb·6) ray-major packed enter/leave positions
    (``pack_pair_pos``) — narrow (N·kb, c) operands would be materialized
    (8, 128)-tile padded at the custom-call boundary (0.5 ms per tensor at
    production shapes, see ``pack_pair_pos``); the per-ray packing keeps
    every buffer lane-dense and the kernel unpacks in VMEM.

    ``tiles_per_image``: when set, ``cell_ids`` are PER-IMAGE local ids and
    ``vox_table`` is (B·n_cells_img, Cv); each grid tile lies within one
    image and sees only that image's (n_cells_img, Cv) table block (BlockSpec
    index ``i // tiles_per_image``) — a 4× (B=4) cheaper one-hot than global
    ids. Requires rays_per_tile · tiles_per_image = rays per image."""
    in_kernel_vox = cell_ids is not None
    per_image = tiles_per_image is not None
    n_rays, c_ray = ray_feat.shape
    n_rows = n_rays * kb
    if in_kernel_vox:
        n_cells, c_vox = vox_table.shape
        assert cell_ids.shape == (n_rays, kb), (cell_ids.shape, n_rays, kb)
        if per_image:
            n_imgs = n_rays // (tiles_per_image * rays_per_tile)
            assert n_rays == n_imgs * tiles_per_image * rays_per_tile
            n_cells = n_cells // n_imgs
    else:
        c_vox = pair_vox.shape[1]
        assert pair_vox.shape[0] == n_rows, (pair_vox.shape, n_rows)
    assert pos.shape == (n_rays, kb * 6), (pos.shape, n_rays, kb)
    c_pos = 6 * (1 + 2 * multires)
    # ``train`` is set by every custom-VJP forward rule (with or without a
    # save mode — decode_bwd='kernel' trains save-free); serving calls the
    # primals directly. Packing follows the measured defaults per path.
    w = _prep_weights(weights, c_vox, c_ray - 27, c_pos, 27, dtype,
                      pack_l1=(PACK_L1_TRAIN if (train or save_mode)
                               else PACK_L1_SERVE))

    t = rays_per_tile
    pad_rays = 0 if per_image else (-n_rays) % t
    if pad_rays:
        ray_feat = jnp.pad(ray_feat, ((0, pad_rays), (0, 0)))
        pos = jnp.pad(pos, ((0, pad_rays), (0, 0)))
        if in_kernel_vox:
            cell_ids = jnp.pad(cell_ids, ((0, pad_rays), (0, 0)))
        else:
            pair_vox = jnp.pad(pair_vox, ((0, pad_rays * kb), (0, 0)))
    n_tiles = (n_rays + pad_rays) // t
    rows_t = t * kb

    wkeys = sorted(w)
    warrs = [jnp.atleast_2d(w[k]) for k in wkeys]
    g4 = weights["off_w1"].shape[1]
    g2_, g3_ = weights["off_w2"].shape[1], weights["off_w3"].shape[1]
    save_lay = _save_layout(save_mode, g4, g2_, g3_, 12 * multires, n_iter,
                            dtype)

    def kernel(vox_ref, pos_ref, ray_ref, *rest):
        if save_lay:
            wrefs = rest[:-(2 + len(save_lay))]
            off_ref, logit_ref = rest[-(2 + len(save_lay)):-len(save_lay)]
            save_refs = rest[-len(save_lay):]
        else:
            wrefs, (off_ref, logit_ref) = rest[:-2], rest[-2:]
            save_refs = ()
        if in_kernel_vox:
            table_ref, wrefs = wrefs[-1], wrefs[:-1]
        wd = {k: (r[0] if w[k].ndim == 1 else r[:])
              for k, r in zip(wkeys, wrefs)}
        dot = lambda a, b: jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if in_kernel_vox:
            # one-hot MXU lookup: rows (rows_t, n_cells) @ table (n_cells, Cv)
            (ids,) = _sel_cols(vox_ref[:], t, kb, 1, (0,))  # (rows_t, 1) i32
            cols = jax.lax.broadcasted_iota(jnp.int32, (rows_t, n_cells), 1)
            onehot = (ids == cols).astype(dtype)
            pair_vox_t = dot(onehot, table_ref[:]).astype(dtype)
        else:
            pair_vox_t = vox_ref[:].astype(dtype)
        ray_rows = ray_ref[:]
        if "lr_w1" in wd:  # packed: ONE (c_ray, 2·4g) per-ray partial
            ray_e1_off = dot(ray_rows, wd["lr_w1"])
            ray_e1_prob = None
        else:
            ray_e1_off = dot(ray_rows, wd["offr_w1"])
            ray_e1_prob = dot(ray_rows, wd["probr_w1"])
        pos6 = jnp.concatenate(_sel_cols(pos_ref[:], t, kb, 6, range(6)), -1)
        out = _decode_rows(pair_vox_t, pos6, ray_e1_off,
                           ray_e1_prob, wd, kb, n_iter=n_iter,
                           init_offset=init_offset,
                           use_sigmoid=use_sigmoid, dtype=dtype,
                           save_mode=save_mode)
        off_ref[:] = _pack_slots(out[0][:, None], t, kb)
        logit_ref[:] = _pack_slots(out[1][:, None], t, kb)
        if save_lay:
            saves = out[2]
            for (name, cols, sdt), ref in zip(save_lay, save_refs):
                val = saves[name]
                ref[:] = (val if cols > 1 else val[:, :1]).astype(sdt)

    w_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for a in warrs]
    out_spec = pl.BlockSpec((t, kb), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    flops = 2 * (n_rays + pad_rays) * (
        kb * ((c_vox + c_pos) * g4 * 2
              + (n_iter + 1) * (g4 * g4 // 2 + (g4 // 2) * (g4 // 4) + g4 // 4))
        + c_ray * g4 * 2)

    if in_kernel_vox:
        vox_in = cell_ids.astype(jnp.int32)
        vox_spec = pl.BlockSpec((t, kb), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        extra = [jnp.asarray(vox_table, dtype)]
        if per_image:
            tpi = tiles_per_image
            extra_specs = [pl.BlockSpec((n_cells, c_vox),
                                        lambda i: (i // tpi, 0),
                                        memory_space=pltpu.VMEM)]
        else:
            extra_specs = [pl.BlockSpec(vox_table.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)]
        flops += 2 * (n_rays + pad_rays) * kb * n_cells * c_vox
    else:
        vox_in = pair_vox
        vox_spec = pl.BlockSpec((rows_t, c_vox), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        extra, extra_specs = [], []

    # tiles beyond 512 rows exceed the default 16 MB scoped-VMEM stack
    # (~20 KB/row measured from the compiler's own report) — raise the cap
    vmem_limit = None if rows_t <= 512 else min(
        int(rows_t * 24 * 1024 + 8 * 2 ** 20), 120 * 2 ** 20)
    n_pad_rows = (n_rays + pad_rays) * kb
    save_specs = tuple(
        pl.BlockSpec((rows_t, cols), lambda i: (i, 0),
                     memory_space=pltpu.VMEM) for _, cols, _ in save_lay)
    save_shapes = tuple(
        jax.ShapeDtypeStruct((n_pad_rows, cols), sdt)
        for _, cols, sdt in save_lay)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[vox_spec,
                  pl.BlockSpec((t, kb * 6), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((t, c_ray), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  *w_specs, *extra_specs],
        out_specs=(out_spec, out_spec, *save_specs),
        out_shape=(jax.ShapeDtypeStruct((n_rays + pad_rays, kb), jnp.float32),
                   jax.ShapeDtypeStruct((n_rays + pad_rays, kb), jnp.float32),
                   *save_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n_rays + pad_rays) * kb * (c_vox * 2 + 32),
            transcendentals=(n_rays + pad_rays) * kb * 12 * multires),
        interpret=interpret,
    )(vox_in, pos, ray_feat, *warrs, *extra)
    off, logit = outs[0], outs[1]
    if save_lay:
        return (off[:n_rays], logit[:n_rays], tuple(outs[2:]))
    return off[:n_rays], logit[:n_rays]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def fused_ray_decode_onehot(cell_ids, pos, ray_feat_and_table, weights,
                            kb, multires=8, n_iter=2, init_offset=0.001,
                            use_sigmoid=False, dtype=jnp.bfloat16,
                            rays_per_tile=256, interpret=False):
    """Variant with the voxel-feature lookup INSIDE the kernel (one-hot MXU
    against the VMEM-resident table). ``cell_ids``: (N, kb) ray-major;
    ``pos``: (N, kb·6) packed; ``ray_feat_and_table`` is a tuple
    (ray_feat (N, Cr), vox_table (n_cells, Cv))."""
    ray_feat, vox_table = ray_feat_and_table
    return _fused_fwd_impl(None, pos, ray_feat, weights, kb, multires,
                           n_iter, init_offset, use_sigmoid, dtype,
                           rays_per_tile, interpret,
                           cell_ids=cell_ids, vox_table=vox_table)


def _onehot_fwd(cell_ids, pos, ray_feat_and_table, weights, kb, multires,
                n_iter, init_offset, use_sigmoid, dtype, rays_per_tile,
                interpret):
    ray_feat, vox_table = ray_feat_and_table
    out = _fused_fwd_impl(None, pos, ray_feat, weights, kb, multires,
                          n_iter, init_offset, use_sigmoid, dtype,
                          rays_per_tile, interpret,
                          cell_ids=cell_ids, vox_table=vox_table, train=True)
    return out, (cell_ids, pos, ray_feat_and_table, weights)


def _onehot_bwd(kb, multires, n_iter, init_offset, use_sigmoid, dtype,
                rays_per_tile, interpret, res, g):
    cell_ids, pos, (ray_feat, vox_table), weights = res
    n_rays = ray_feat.shape[0]
    pos_rows = _pos_rows(pos, kb)
    flat_ids = cell_ids.reshape(-1)

    def ref(rf, table, ws):
        pv = table[flat_ids]
        off, logit = xla_ray_decode(pv, pos_rows, rf, ws, kb=kb,
                                    multires=multires, n_iter=n_iter,
                                    init_offset=init_offset,
                                    use_sigmoid=use_sigmoid, dtype=dtype)
        return off.reshape(n_rays, kb), logit.reshape(n_rays, kb)

    _, vjp = jax.vjp(ref, ray_feat, vox_table, weights)
    d_rf, d_table, d_w = vjp(g)
    d_ids = np.zeros(cell_ids.shape, dtype=jax.dtypes.float0)  # int primal
    return d_ids, jnp.zeros_like(pos), (d_rf, d_table), d_w


fused_ray_decode_onehot.defvjp(_onehot_fwd, _onehot_bwd)


def _fused_fwd(pair_vox, pos, ray_feat, weights, kb, multires, n_iter,
               init_offset, use_sigmoid, dtype, rays_per_tile, interpret,
               bwd_impl):
    out = _fused_fwd_impl(pair_vox, pos, ray_feat, weights, kb, multires,
                          n_iter, init_offset, use_sigmoid, dtype,
                          rays_per_tile, interpret, train=True)
    return out, (pair_vox, pos, ray_feat, weights)


def _fused_bwd(kb, multires, n_iter, init_offset, use_sigmoid, dtype,
               rays_per_tile, interpret, bwd_impl, res, g):
    """Backward. 'xla': exact grads by re-running the identical-math XLA
    path under jax.vjp (recompute ≙ rematerialization — nothing saved from
    the kernel). 'kernel': fused backward kernel (_fused_bwd_impl)."""
    pair_vox, pos, ray_feat, weights = res
    if bwd_impl in ("kernel", "kernel_save"):  # rows mode has no save path
        d_pv, d_rf, d_w = _fused_bwd_impl(
            pair_vox, pos, ray_feat, weights, g[0], g[1], kb, multires,
            n_iter, init_offset, use_sigmoid, dtype, rays_per_tile, interpret)
        return d_pv, jnp.zeros_like(pos), d_rf, d_w
    n_rays = ray_feat.shape[0]
    pos_rows = _pos_rows(pos, kb)

    def ref(pv, rf, ws):
        off, logit = xla_ray_decode(
            pv, pos_rows, rf, ws, kb=kb, multires=multires, n_iter=n_iter,
            init_offset=init_offset, use_sigmoid=use_sigmoid, dtype=dtype)
        return off.reshape(n_rays, kb), logit.reshape(n_rays, kb)

    _, vjp = jax.vjp(ref, pair_vox, ray_feat, weights)
    d_pv, d_rf, d_w = vjp(g)
    # pos has no parameter ancestry (geometry from prepare_inputs; the
    # reference's CUDA kernels are likewise non-differentiable) — zero grad
    return d_pv, jnp.zeros_like(pos), d_rf, d_w


fused_ray_decode.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def fused_ray_decode_table(cells, pos, ray_feat, vox_table, weights,
                           kb, tiles_per_image, multires=8, n_iter=2,
                           init_offset=0.001, use_sigmoid=False,
                           dtype=jnp.bfloat16, rays_per_tile=256,
                           interpret=False, bwd_impl="kernel"):
    """Per-image-table variant — the TPU training/serving default.

    ``cells``: (N, kb) int32 ray-major LOCAL cell ids (0..n_cells_img);
    ``pos``: (N, kb·6) packed (``pack_pair_pos``); ``vox_table``:
    (B·n_cells_img, Cv). The voxel-feature lookup happens IN-kernel as a
    one-hot MXU matmul against the ray's image's table block, and (with
    ``bwd_impl='kernel'``) the cotangent folds back into d_vox_table
    in-kernel the same way — the XLA gather + 640k-row scatter-add (and the
    (N·kb, Cv) row traffic, ~330 MB of f32 cotangents at production shapes)
    disappear entirely. Exact forward: the one-hot picks a single bf16
    element under f32 accumulation, bit-identical to gather+cast.

    Returns (offset, prob_logit), each (N, kb) f32 ray-major.

    Requires rays_per_tile · tiles_per_image = rays per image (tiles never
    straddle images).
    """
    return _fused_fwd_impl(None, pos, ray_feat, weights, kb, multires,
                           n_iter, init_offset, use_sigmoid, dtype,
                           rays_per_tile, interpret, cell_ids=cells,
                           vox_table=vox_table,
                           tiles_per_image=tiles_per_image)


def _table_fwd(cells, pos, ray_feat, vox_table, weights, kb, tiles_per_image,
               multires, n_iter, init_offset, use_sigmoid, dtype,
               rays_per_tile, interpret, bwd_impl):
    if bwd_impl in ("kernel_save", "kernel_save_all"):
        # forward additionally writes saved activations so the backward skips
        # recompute matmuls: 'kernel_save' saves the two layer-1
        # pre-activations ((N·kb, 4g) each, ~66% of the recompute FLOPs for
        # ~0.7 GB round-trip); 'kernel_save_all' additionally saves every
        # h2/h3 and the pre-squash offsets/logit — the backward recomputes
        # NO matmuls (h1 is elementwise from e1). Both measured net wins
        # (BASELINE.md).
        off, logit, saves = _fused_fwd_impl(
            None, pos, ray_feat, weights, kb, multires, n_iter, init_offset,
            use_sigmoid, dtype, rays_per_tile, interpret, cell_ids=cells,
            vox_table=vox_table, tiles_per_image=tiles_per_image,
            save_mode="l1" if bwd_impl == "kernel_save" else "all")
        return (off, logit), (cells, pos, ray_feat, vox_table, weights,
                              saves)
    # save-free training forward ('kernel'/'xla' bwd): same math as the
    # primal but flagged train=True so packing follows the training default
    out = _fused_fwd_impl(None, pos, ray_feat, weights, kb, multires,
                          n_iter, init_offset, use_sigmoid, dtype,
                          rays_per_tile, interpret, cell_ids=cells,
                          vox_table=vox_table,
                          tiles_per_image=tiles_per_image, train=True)
    return out, (cells, pos, ray_feat, vox_table, weights, None)


def _table_bwd(kb, tiles_per_image, multires, n_iter, init_offset,
               use_sigmoid, dtype, rays_per_tile, interpret, bwd_impl,
               res, g):
    cells, pos, ray_feat, vox_table, weights, saved = res
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    if bwd_impl in ("kernel", "kernel_save", "kernel_save_all"):
        d_table, d_rf, d_w = _fused_bwd_impl(
            None, pos, ray_feat, weights, g[0], g[1], kb, multires, n_iter,
            init_offset, use_sigmoid, dtype, rays_per_tile, interpret,
            cell_ids=cells, vox_table=vox_table,
            tiles_per_image=tiles_per_image, saved=saved,
            save_mode={"kernel_save": "l1",
                       "kernel_save_all": "all"}.get(bwd_impl))
        return f0(cells), jnp.zeros_like(pos), d_rf, d_table, d_w

    # XLA fallback: globalize the local ids and differentiate the
    # identical-math XLA path (gather vjp -> scatter-add)
    n_rays = ray_feat.shape[0]
    n_rows = n_rays * kb
    rows_per_img = tiles_per_image * rays_per_tile * kb
    n_imgs = n_rows // rows_per_img
    n_cells = vox_table.shape[0] // n_imgs
    flat_cells = cells.reshape(-1)
    gcells = flat_cells + (jnp.arange(n_rows, dtype=cells.dtype)
                           // rows_per_img) * n_cells
    pos_rows = _pos_rows(pos, kb)

    def ref(rf, table, ws):
        pv = table[gcells]
        off, logit = xla_ray_decode(pv, pos_rows, rf, ws, kb=kb,
                                    multires=multires, n_iter=n_iter,
                                    init_offset=init_offset,
                                    use_sigmoid=use_sigmoid, dtype=dtype)
        return off.reshape(n_rays, kb), logit.reshape(n_rays, kb)

    _, vjp = jax.vjp(ref, ray_feat, vox_table, weights)
    d_rf, d_table, d_w = vjp(g)
    return f0(cells), jnp.zeros_like(pos), d_rf, d_table, d_w


fused_ray_decode_table.defvjp(_table_fwd, _table_bwd)


# ---------------------------------------------------------------------------
# Stage-2 (refine) fused IEF decode: per-RAY rows, one decoder, no slots.
# ---------------------------------------------------------------------------

def _prep_ief_weights(weights: Dict[str, jnp.ndarray], c_end: int, c_rc: int,
                      c_pos: int, c_dir: int, dtype):
    """Split the IEF layer-1 kernel over the stage-2 embed layout
    [end_feat(c_end) | roi(c_rc-c_dir) | pos_e(c_pos) | dir_e(c_dir) |
    enc(16)] into the (end, rc=[roi|dir], pos, enc) operand groups the
    kernel consumes — a pure row reindex of ``w1`` (models/refine.py:146)."""
    w1 = weights["w1"]
    o1 = c_end
    o2 = o1 + (c_rc - c_dir)
    o3 = o2 + c_pos
    o4 = o3 + c_dir
    w = {
        "w_end": w1[:o1],
        "w_rc": jnp.concatenate([w1[o1:o2], w1[o3:o4]], axis=0),
        "w_pos": w1[o2:o3],
        "w_x": w1[o4:],
        "enc_w": weights["enc_w"], "enc_b": weights["enc_b"],
        "b1": weights["b1"],
        "w2": weights["w2"], "b2": weights["b2"],
        "w3": weights["w3"], "b3": weights["b3"],
        "w4": weights["w4"], "b4": weights["b4"],
    }
    cast = lambda k, a: (jnp.asarray(a, jnp.float32)
                         if k in ("b1", "b2", "b3", "b4", "enc_b")
                         else jnp.asarray(a, dtype))
    return {k: cast(k, a) for k, a in w.items()}


def _ief_rows(end_rows, rc_rows, pos_rows, w, *, n_iter, init_offset,
              use_sigmoid, dtype):
    """Shared tile math for the stage-2 IEF decode (layer-1 hoisted across
    the IEF iterations, offset-encoder folded to a rank-1 update — the same
    algebra as ``_decode_rows``' offset decoder). Returns (rows,) f32
    post-squash offsets."""
    rows = end_rows.shape[0]
    act = lambda v: jnp.where(v > 0, v, LEAKY * v)
    dot = lambda a, b: jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    e1 = (dot(end_rows, w["w_end"]) + dot(rc_rows, w["w_rc"])
          + dot(pos_rows, w["w_pos"]) + w["b1"])
    a_vec = dot(w["enc_w"], w["w_x"])                    # (1, 4g)
    c_vec = dot(w["enc_b"][None, :], w["w_x"])[0]
    offset = jnp.full((rows, 1), init_offset, jnp.float32)
    for _ in range(n_iter):
        h1 = act(e1 + offset * a_vec + c_vec).astype(dtype)
        h2 = act(dot(h1, w["w2"]) + w["b2"].astype(dtype))
        h3 = act(dot(h2, w["w3"]) + w["b3"].astype(dtype))
        offset = offset + dot(h3, w["w4"]) + w["b4"]
    sq = jax.nn.sigmoid if use_sigmoid else _soft_clamp
    return sq(offset)[:, 0]


def xla_ief_rows(end_rows, rc_rows, pos_rows, weights, *, c_dir=27, n_iter=2,
                 init_offset=0.001, use_sigmoid=False,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Identical math, plain XLA — the kernel's correctness oracle, CPU
    fallback, and the recompute path for the custom VJP backward."""
    w = _prep_ief_weights(weights, end_rows.shape[1], rc_rows.shape[1],
                          pos_rows.shape[1], c_dir, dtype)
    return _ief_rows(end_rows, rc_rows, pos_rows, w, n_iter=n_iter,
                     init_offset=init_offset, use_sigmoid=use_sigmoid,
                     dtype=dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_ief_rows(end_rows, rc_rows, pos_rows, weights,
                   c_dir=27, n_iter=2, init_offset=0.001, use_sigmoid=False,
                   dtype=jnp.bfloat16, rows_per_tile=2000, interpret=False):
    """Stage-2 fused IEF decode — Pallas TPU kernel (round 3).

    The refine offset decode is per-RAY (no slot dim): N = B·R rows of a
    334-d embed -> one scalar offset. Operands arrive as the embed's concat
    PARTS (end_feat (N, 128) — varies per refine iteration; rc = [roi |
    dir_e] (N, 155) — iteration-constant; pos_e (N, 51) — the positional
    encoding of the current prediction) so the (N, 334) concat never
    materializes in HBM (the measured 0.2-0.25 ms per iteration,
    refine-path trace); layer 1 is split over the parts (``split_l1``
    algebra), hoisted across the IEF iterations, and all weights stay
    VMEM-resident. Output rides a lane-dense (n_tiles, t) block (a (N, 1)
    column would be (8, 128)-tile padded at the custom-call boundary).

    ``c_dir`` is the encoded-direction width inside ``rc_rows`` (3·(1+2·
    multires_views)) — the layer-1 row split depends on it. Returns (N,)
    f32 post-squash offsets. The backward re-runs the identical-math XLA
    path under ``jax.vjp`` (exact grads; stage-2 training is not
    kernel-bound the way stage-1 was).
    """
    return _ief_fwd_impl(end_rows, rc_rows, pos_rows, weights, c_dir, n_iter,
                         init_offset, use_sigmoid, dtype, rows_per_tile,
                         interpret)


def _ief_fwd_impl(end_rows, rc_rows, pos_rows, weights, c_dir, n_iter,
                  init_offset, use_sigmoid, dtype, rows_per_tile, interpret):
    n, c_end = end_rows.shape
    c_rc, c_pos = rc_rows.shape[1], pos_rows.shape[1]
    w = _prep_ief_weights(weights, c_end, c_rc, c_pos, c_dir, dtype)

    if rows_per_tile % 8:
        raise ValueError("refine_decode_rows_per_tile must be a multiple of "
                         f"8 (got {rows_per_tile}) — the kernel emits the "
                         "tile's offsets as an (8, t/8) lane-dense block")
    t = rows_per_tile
    pad = (-n) % t
    if pad:
        end_rows = jnp.pad(end_rows, ((0, pad), (0, 0)))
        rc_rows = jnp.pad(rc_rows, ((0, pad), (0, 0)))
        pos_rows = jnp.pad(pos_rows, ((0, pad), (0, 0)))
    n_tiles = (n + pad) // t

    wkeys = sorted(w)
    warrs = [jnp.atleast_2d(w[k]) for k in wkeys]
    g4 = weights["w1"].shape[1]
    g2, g3 = weights["w2"].shape[1], weights["w3"].shape[1]

    def kernel(end_ref, rc_ref, pos_ref, *rest):
        wrefs, out_ref = rest[:-1], rest[-1]
        wd = {k: (r[0] if w[k].ndim == 1 else r[:])
              for k, r in zip(wkeys, wrefs)}
        off = _ief_rows(end_ref[:], rc_ref[:], pos_ref[:], wd,
                        n_iter=n_iter, init_offset=init_offset,
                        use_sigmoid=use_sigmoid, dtype=dtype)
        # lane-dense output: the tile's t offsets as a row-major (8, t/8)
        # block (a (t, 1) column would be (8, 128)-tile padded at the
        # boundary, and Mosaic rejects sublane-1 output blocks)
        out_ref[:] = _pack_slots(off[:, None], 8, t // 8)

    row_spec = lambda c: pl.BlockSpec((t, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for a in warrs]
    flops = 2 * (n + pad) * ((c_end + c_rc + c_pos) * g4
                             + n_iter * (g4 * g2 + g2 * g3 + g3))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[row_spec(c_end), row_spec(c_rc), row_spec(c_pos), *w_specs],
        out_specs=pl.BlockSpec((8, t // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, t // 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n + pad) * (c_end + c_rc + c_pos) * 2,
            transcendentals=0),
        interpret=interpret,
    )(end_rows, rc_rows, pos_rows, *warrs)
    return out.reshape(-1)[:n]


def _ief_fwd(end_rows, rc_rows, pos_rows, weights, c_dir, n_iter,
             init_offset, use_sigmoid, dtype, rows_per_tile, interpret):
    out = _ief_fwd_impl(end_rows, rc_rows, pos_rows, weights, c_dir, n_iter,
                        init_offset, use_sigmoid, dtype, rows_per_tile,
                        interpret)
    return out, (end_rows, rc_rows, pos_rows, weights)


def _ief_bwd(c_dir, n_iter, init_offset, use_sigmoid, dtype, rows_per_tile,
             interpret, res, g):
    end_rows, rc_rows, pos_rows, weights = res

    def ref(e, rc, p, ws):
        return xla_ief_rows(e, rc, p, ws, c_dir=c_dir, n_iter=n_iter,
                            init_offset=init_offset,
                            use_sigmoid=use_sigmoid, dtype=dtype)

    _, vjp = jax.vjp(ref, end_rows, rc_rows, pos_rows, weights)
    return vjp(g)


fused_ief_rows.defvjp(_ief_fwd, _ief_bwd)


def _fused_bwd_impl(pair_vox, pos, ray_feat, weights, g_off, g_logit,
                    kb, multires, n_iter, init_offset, use_sigmoid, dtype,
                    rays_per_tile, interpret,
                    *, cell_ids=None, vox_table=None, tiles_per_image=None,
                    saved=None, save_mode=None):
    """Fused backward kernel: per tile, recompute the forward in VMEM
    (activations never touch HBM — for the production shapes h1 alone would
    be ~330 MB), then backprop both MLPs. Weight-gradient accumulators use
    constant-index output blocks that stay VMEM-resident across the
    sequential grid ('arbitrary' semantics) and flush once at the end.

    Returns (d_pair_vox, d_ray_feat, d_weights) with d_weights in the
    original (unsplit) pipeline layout.

    Table mode (``cell_ids`` + ``vox_table`` + ``tiles_per_image``, matching
    the forward's per-image local-id lookup): the voxel rows are looked up
    in-kernel (one-hot MXU against the image's table block) and the FIRST
    return becomes d_vox_table (B·n_cells_img, Cv) — accumulated in-kernel
    as onehotᵀ @ d_rows into a per-image VMEM block, so neither the (N·kb,
    Cv) gathered rows nor their f32 cotangents ever touch HBM and the XLA
    scatter-add that used to fold d_rows into the table disappears.
    """
    per_image = tiles_per_image is not None
    n_rays, c_ray = ray_feat.shape
    n_rows = n_rays * kb
    if per_image:
        n_tab, c_vox = vox_table.shape
        assert cell_ids.shape == (n_rays, kb)
        n_imgs = n_rays // (tiles_per_image * rays_per_tile)
        assert n_rays == n_imgs * tiles_per_image * rays_per_tile
        n_cells = n_tab // n_imgs
    else:
        c_vox = pair_vox.shape[1]
    c_pos = 6 * (1 + 2 * multires)
    c_roi, c_dir = c_ray - 27, 27
    cp = c_vox + c_pos
    w = _prep_weights(weights, c_vox, c_roi, c_pos, c_dir, dtype,
                      pack_l1=PACK_L1_TRAIN)
    g = weights["off_w1"].shape[1]
    g2, g3 = weights["off_w2"].shape[1], weights["off_w3"].shape[1]

    # cotangents arrive ray-major (n_rays, kb); pack both into one
    # lane-dense (n_rays, 2·kb) operand (see pack_pair_pos on why)
    gpair = jnp.concatenate([g_off.astype(jnp.float32),
                             g_logit.astype(jnp.float32)], axis=-1)

    t = rays_per_tile
    pad_rays = 0 if per_image else (-n_rays) % t
    if pad_rays:
        ray_feat = jnp.pad(ray_feat, ((0, pad_rays), (0, 0)))
        pos = jnp.pad(pos, ((0, pad_rays), (0, 0)))
        pair_vox = jnp.pad(pair_vox, ((0, pad_rays * kb), (0, 0)))
        gpair = jnp.pad(gpair, ((0, pad_rays), (0, 0)))
    n_tiles = (n_rays + pad_rays) // t
    rows_t = t * kb

    wkeys = sorted(w)
    warrs = [jnp.atleast_2d(w[k]) for k in wkeys]

    c_tr = 12 * multires  # trig rows of the split layer 1
    # (name, shape) of the weight-grad accumulators, in output order
    acc_shapes = [
        ("offv", (c_vox, g)), ("offp6", (6, g)), ("offtr", (c_tr, g)),
        ("offr", (c_ray, g)),
        ("probv", (c_vox, g)), ("probp6", (6, g)), ("probtr", (c_tr, g)),
        ("probr", (c_ray, g)),
        ("offb1", (1, g)), ("probb1", (1, g)),
        ("avec", (1, g)), ("cvec", (1, g)),
        ("ow2", (g, g2)), ("ob2", (1, g2)),
        ("ow3", (g2, g3)), ("ob3", (1, g3)),
        ("ow4", (g3, 1)), ("ob4", (1, 1)),
        ("pw2", (g, g2)), ("pb2", (1, g2)),
        ("pw3", (g2, g3)), ("pb3", (1, g3)),
        ("pw4", (g3, 1)), ("pb4", (1, 1)),
    ]

    act = lambda v: jnp.where(v > 0, v, LEAKY * v)
    # d * lrelu'(z), with h = lrelu(z) (same sign as z). Written as a
    # two-operand select — Mosaic rejects the splat-constant mask form
    # ("Invalid relayout ... replicated in destination" on the i1 vector) —
    # and compares in f32 (bf16 vector cmpf: "Target does not support this
    # comparison")
    dlrelu = lambda h, d: jnp.where(h.astype(jnp.float32) > 0, d, LEAKY * d)

    def dsq(x, d):  # d * squash'(x) at pre-squash x
        if use_sigmoid:
            s = jax.nn.sigmoid(x)
            return d * s * (1 - s)
        return jnp.where((x > 0) & (x < 1), d, 0.01 * d)

    save_lay = _save_layout(save_mode, g, g2, g3, c_tr, n_iter, dtype)

    def kernel(vox_ref, pos_ref, ray_ref, gpair_ref, *rest):
        if save_lay:
            save_refs, rest = rest[:len(save_lay)], rest[len(save_lay):]
            sd = {name: ref for (name, _, _), ref in zip(save_lay, save_refs)}
        wrefs = rest[:len(wkeys)]
        if per_image:
            table_ref, rest = rest[len(wkeys)], rest[len(wkeys) + 1:]
            outs = rest
        else:
            outs = rest[len(wkeys):]
        dvox_ref, dray_ref = outs[0], outs[1]
        acc_refs = dict(zip([n for n, _ in acc_shapes], outs[2:]))
        wd = {k: (r[0] if w[k].ndim == 1 else r[:])
              for k, r in zip(wkeys, wrefs)}
        # unpack the ray-major narrow operands to (rows, 1) columns in VMEM
        goff_col, glogit_col = _sel_cols(gpair_ref[:], t, kb, 1, (0, kb))
        pos6 = jnp.concatenate(_sel_cols(pos_ref[:], t, kb, 6, range(6)), -1)
        dot = lambda a, b: jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # a (rows, m), b (rows, n) -> (m, n): contract over rows
        dot_tn = lambda a, b: jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d (rows, n) @ w^T for w (m, n) -> (rows, m)
        dot_nt = lambda d, ww: jax.lax.dot_general(
            d.astype(dtype), ww.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        csum = lambda d: jnp.sum(d, axis=0, keepdims=True)

        # ---- forward recompute, keeping activations ----------------------
        if per_image:
            (ids,) = _sel_cols(vox_ref[:], t, kb, 1, (0,))   # (rows_t, 1) i32
            cols = jax.lax.broadcasted_iota(jnp.int32, (rows_t, n_cells), 1)
            onehot = (ids == cols).astype(dtype)
            pair_vox_t = dot(onehot, table_ref[:]).astype(dtype)
        else:
            pair_vox_t = vox_ref[:].astype(dtype)
        ray_rows = ray_ref[:]
        # trig block for the split layer 1 (pe never materializes); in save
        # mode the forward saved it — the bf16 reload is bit-identical to
        # recompute+cast and skips the 61M-sin pass
        if save_lay:
            trig = sd["trig"][:]
        else:
            trig = _trig_block(pos6, wd["pe_smat"], wd["pe_phase"])

        def bcast(ray_part):
            return jnp.broadcast_to(
                ray_part.reshape(t, 1, ray_part.shape[1]),
                (t, kb, ray_part.shape[1])).reshape(rows_t, ray_part.shape[1])

        if save_lay:
            # layer-1 pre-activations saved by the forward: skip BOTH big
            # layer-1 matmuls and the per-ray partials (~66% of the
            # recompute FLOPs); the parts are still needed for weight grads
            e1_off = sd["e1"][:].astype(jnp.float32)
            z1p = sd["z1p"][:].astype(jnp.float32)
        elif "lv_w1" in wd:
            # packed recompute (PACK_L1): one 2·4g-wide layer-1 chain
            both = (dot(pair_vox_t, wd["lv_w1"]) + dot(pos6, wd["lp6_w1"])
                    + dot(trig, wd["ltr_w1"])
                    + bcast(dot(ray_rows, wd["lr_w1"])) + wd["l_b1"])
            e1_off, z1p = both[:, :g], both[:, g:]
        else:
            ray_e1_off = dot(ray_rows, wd["offr_w1"])
            ray_e1_prob = dot(ray_rows, wd["probr_w1"])
            e1_off = (dot(pair_vox_t, wd["offv_w1"]) + dot(pos6, wd["offp6_w1"])
                      + dot(trig, wd["offtr_w1"]) + bcast(ray_e1_off)
                      + wd["off_b1"])
            z1p = (dot(pair_vox_t, wd["probv_w1"]) + dot(pos6, wd["probp6_w1"])
                   + dot(trig, wd["probtr_w1"]) + bcast(ray_e1_prob)
                   + wd["prob_b1"])
        a_vec = dot(wd["off_enc_w"], wd["offx_w1"])            # (1, g)
        c_vec = dot(wd["off_enc_b"][None, :], wd["offx_w1"])[0]
        if save_mode == "all":
            # every matmul-produced activation was saved by the forward —
            # the backward recomputes only the elementwise h1 = act(e1 +
            # off_i·a + c) per iteration (BASELINE.md kernel_save_all)
            acts = []
            for i in range(n_iter):
                off_i = sd[f"off{i}"][:]
                h1 = act(e1_off + off_i * a_vec + c_vec).astype(dtype)
                acts.append((off_i, h1, sd[f"h2_{i}"][:], sd[f"h3_{i}"][:]))
            offset = sd["off_fin"][:]
            h1p = act(z1p).astype(dtype)
            h2p, h3p = sd["h2p"][:], sd["h3p"][:]
            logit = sd["logit"][:]
        else:
            offset = jnp.full((rows_t, 1), init_offset, jnp.float32)
            acts = []
            for _ in range(n_iter):
                h1 = act(e1_off + offset * a_vec + c_vec).astype(dtype)
                h2 = act(dot(h1, wd["off_w2"]) + wd["off_b2"].astype(dtype))
                h3 = act(dot(h2, wd["off_w3"]) + wd["off_b3"].astype(dtype))
                acts.append((offset, h1, h2, h3))
                offset = offset + dot(h3, wd["off_w4"]) + wd["off_b4"]

            h1p = act(z1p).astype(dtype)
            h2p = act(dot(h1p, wd["prob_w2"]) + wd["prob_b2"].astype(dtype))
            h3p = act(dot(h2p, wd["prob_w3"]) + wd["prob_b3"].astype(dtype))
            logit = dot(h3p, wd["prob_w4"]) + wd["prob_b4"]

        # ---- backward ----------------------------------------------------
        acc = {}

        def add(name, val):
            acc[name] = acc.get(name, 0) + val

        d_offset = dsq(offset, goff_col)                       # (rows, 1)
        d_e1_off = jnp.zeros((rows_t, g), jnp.float32)
        for i in range(n_iter - 1, -1, -1):
            off_i, h1, h2, h3 = acts[i]
            add("ow4", dot_tn(h3, d_offset))
            add("ob4", csum(d_offset))
            d_h3 = dot_nt(d_offset, wd["off_w4"])
            d_t3 = dlrelu(h3, d_h3)
            add("ow3", dot_tn(h2, d_t3))
            add("ob3", csum(d_t3))
            d_h2 = dot_nt(d_t3, wd["off_w3"])
            d_t2 = dlrelu(h2, d_h2)
            add("ow2", dot_tn(h1, d_t2))
            add("ob2", csum(d_t2))
            d_h1 = dot_nt(d_t2, wd["off_w2"])
            d_z1 = dlrelu(h1, d_h1)
            d_e1_off = d_e1_off + d_z1
            add("avec", csum(d_z1 * off_i))
            add("cvec", csum(d_z1))
            d_offset = d_offset + jnp.sum(d_z1 * a_vec, axis=1, keepdims=True)

        d_logit = dsq(logit, glogit_col)
        add("pw4", dot_tn(h3p, d_logit))
        add("pb4", csum(d_logit))
        d_h3p = dot_nt(d_logit, wd["prob_w4"])
        d_t3p = dlrelu(h3p, d_h3p)
        add("pw3", dot_tn(h2p, d_t3p))
        add("pb3", csum(d_t3p))
        d_h2p = dot_nt(d_t3p, wd["prob_w3"])
        d_t2p = dlrelu(h2p, d_h2p)
        add("pw2", dot_tn(h1p, d_t2p))
        add("pb2", csum(d_t2p))
        d_h1p = dot_nt(d_t2p, wd["prob_w2"])
        d_z1p = dlrelu(h1p, d_h1p)

        if "lv_w1" in wd:
            # packed layer-1 grads (PACK_L1): d_both (rows, 2·4g) against
            # each shared operand ONCE; accumulators keep the per-part
            # layout (lane slices at 4g are free)
            d_both = jnp.concatenate([d_e1_off, d_z1p], axis=-1)
            for part, opnd in (("v", pair_vox_t), ("p6", pos6), ("tr", trig)):
                pk = dot_tn(opnd, d_both)
                add(f"off{part}", pk[:, :g])
                add(f"prob{part}", pk[:, g:])
            add("offb1", csum(d_e1_off))
            add("probb1", csum(d_z1p))
            d_re_both = jnp.sum(d_both.reshape(t, kb, 2 * g), axis=1)
            rk = dot_tn(ray_rows, d_re_both)
            add("offr", rk[:, :g])
            add("probr", rk[:, g:])
            d_rows = dot_nt(d_both, wd["lv_w1"])
        else:
            for pre, d_e1 in (("off", d_e1_off), ("prob", d_z1p)):
                add(f"{pre}v", dot_tn(pair_vox_t, d_e1))
                add(f"{pre}p6", dot_tn(pos6, d_e1))
                add(f"{pre}tr", dot_tn(trig, d_e1))
            add("offb1", csum(d_e1_off))
            add("probb1", csum(d_z1p))
            d_re_off = jnp.sum(d_e1_off.reshape(t, kb, g), axis=1)   # (t, g)
            d_re_prob = jnp.sum(d_z1p.reshape(t, kb, g), axis=1)
            add("offr", dot_tn(ray_rows, d_re_off))
            add("probr", dot_tn(ray_rows, d_re_prob))

        d_rows = d_rows if "lv_w1" in wd else (
            dot_nt(d_e1_off, wd["offv_w1"])
            + dot_nt(d_z1p, wd["probv_w1"]))
        if per_image:
            # d_table block for THIS image: onehotᵀ @ d_rows, accumulated in
            # VMEM across the image's tiles (block index i // tpi is
            # constant within an image, so the block stays resident)
            first_img = pl.program_id(0) % tiles_per_image == 0

            @pl.when(first_img)
            def _():
                dvox_ref[...] = jnp.zeros(dvox_ref.shape, dvox_ref.dtype)

            dvox_ref[...] += dot_tn(onehot, d_rows)
        else:
            dvox_ref[:] = d_rows
        if "lr_w1" in wd:
            dray_ref[:] = dot_nt(d_re_both, wd["lr_w1"])
        else:
            dray_ref[:] = (dot_nt(d_re_off, wd["offr_w1"])
                           + dot_nt(d_re_prob, wd["probr_w1"]))

        first = pl.program_id(0) == 0
        for name, _ in acc_shapes:
            ref = acc_refs[name]

            @pl.when(first)
            def _(ref=ref):
                ref[...] = jnp.zeros(ref.shape, ref.dtype)

            ref[...] += acc[name]

    row_spec = lambda c: pl.BlockSpec((rows_t, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for a in warrs]
    acc_specs = [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
                 for _, s in acc_shapes]
    acc_out_shapes = [jax.ShapeDtypeStruct(s, jnp.float32)
                      for _, s in acc_shapes]

    n_pad_rows = (n_rays + pad_rays) * kb
    mlp_flops = 2 * (n_rays + pad_rays) * (
        kb * (cp * g * 2 + (n_iter + 1) * (g * g2 + g2 * g3 + g3))
        + c_ray * g * 2)
    ray_spec = lambda c: pl.BlockSpec((t, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    if per_image:
        tpi = tiles_per_image
        vox_in = cell_ids.astype(jnp.int32)
        first_in_spec = ray_spec(kb)
        extra_ins = [jnp.asarray(vox_table, dtype)]
        extra_in_specs = [pl.BlockSpec((n_cells, c_vox),
                                       lambda i: (i // tpi, 0),
                                       memory_space=pltpu.VMEM)]
        first_out_spec = pl.BlockSpec((n_cells, c_vox),
                                      lambda i: (i // tpi, 0),
                                      memory_space=pltpu.VMEM)
        first_out_shape = jax.ShapeDtypeStruct(vox_table.shape, jnp.float32)
        mlp_flops += 2 * 2 * n_pad_rows * n_cells * c_vox  # lookup + d_table
        first_bytes = n_pad_rows * 4
    else:
        vox_in = pair_vox
        first_in_spec = row_spec(c_vox)
        extra_ins, extra_in_specs = [], []
        first_out_spec = row_spec(c_vox)
        first_out_shape = jax.ShapeDtypeStruct((n_pad_rows, c_vox),
                                               jnp.float32)
        first_bytes = n_pad_rows * c_vox * 6
    if save_lay:
        save_ins = list(saved)
        save_specs = [row_spec(cols) for _, cols, _ in save_lay]
    else:
        save_ins, save_specs = [], []
    vmem_limit = min(int(rows_t * 64 * 1024 + 24 * 2 ** 20), 128 * 2 ** 20)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[first_in_spec, ray_spec(kb * 6), ray_spec(c_ray),
                  ray_spec(2 * kb), *save_specs, *w_specs,
                  *extra_in_specs],
        out_specs=(first_out_spec, ray_spec(c_ray), *acc_specs),
        out_shape=(first_out_shape,
                   jax.ShapeDtypeStruct((n_rays + pad_rays, c_ray),
                                        jnp.float32),
                   *acc_out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=3 * mlp_flops,
            bytes_accessed=first_bytes + n_pad_rows * 40,
            transcendentals=n_pad_rows * 12 * multires),
        interpret=interpret,
    )(vox_in, pos, ray_feat, gpair, *save_ins, *warrs, *extra_ins)

    d_vox_rows, d_ray_rows = outs[0], outs[1]
    da = dict(zip([n for n, _ in acc_shapes], outs[2:]))

    # ---- reassemble original-layout weight grads -------------------------
    offx = jnp.asarray(w["offx_w1"], jnp.float32)
    enc_w = weights["off_enc_w"].astype(jnp.float32)
    enc_b = weights["off_enc_b"].astype(jnp.float32)
    d_offx = enc_w.T @ da["avec"] + enc_b[:, None] @ da["cvec"]
    half = c_pos // 2  # pe row layout: [enter3 | trigE | leave3 | trigL]
    pe_rows = lambda d6, dtr: [d6[:3], dtr[:half - 3], d6[3:], dtr[half - 3:]]
    unsplit = lambda pre, d_ray, extra: jnp.concatenate(
        [da[f"{pre}v"], d_ray[:c_roi]]
        + pe_rows(da[f"{pre}p6"], da[f"{pre}tr"]) + [d_ray[c_roi:]]
        + ([extra] if extra is not None else []), axis=0)
    d_w = {
        "off_w1": unsplit("off", da["offr"], d_offx),
        "off_b1": da["offb1"][0],
        "off_w2": da["ow2"], "off_b2": da["ob2"][0],
        "off_w3": da["ow3"], "off_b3": da["ob3"][0],
        "off_w4": da["ow4"], "off_b4": da["ob4"][0],
        "prob_w1": unsplit("prob", da["probr"], None),
        "prob_b1": da["probb1"][0],
        "prob_w2": da["pw2"], "prob_b2": da["pb2"][0],
        "prob_w3": da["pw3"], "prob_b3": da["pb3"][0],
        "prob_w4": da["pw4"], "prob_b4": da["pb4"][0],
        "off_enc_w": da["avec"] @ offx.T,
        "off_enc_b": (da["cvec"] @ offx.T)[0],
    }
    d_w = {k: v.astype(weights[k].dtype) for k, v in d_w.items()}
    if per_image:
        d_first = d_vox_rows.astype(vox_table.dtype)        # d_table
    else:
        d_first = d_vox_rows[:n_rows].astype(pair_vox.dtype)
    return d_first, d_ray_rows[:n_rays].astype(ray_feat.dtype), d_w

#!/usr/bin/env python
"""Stage-2 (RefineNet) component timing on the real TPU.

Breaks the two-stage forward into: stage-1 forward, one refine iteration,
and the refine iteration's internals (PointNet re-encode with injected
points, per-ray IEF decode, end-voxel re-localization + feature gather).

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_refine.py
"""

import sys

import jax
import jax.numpy as jnp

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import load_config
from implicit_depth_tpu.data.synthetic import synthetic_batch
from implicit_depth_tpu.models.embedder import positional_encoding
from implicit_depth_tpu.models.lidf import prepare_inputs
from implicit_depth_tpu.utils.profiling import device_slope_time

H, W, BS = 240, 320, 4


def main():
    tpu_over = {"compute_dtype": "bfloat16"}
    for a in sys.argv[1:]:        # e.g. --tile=512
        if a.startswith("--tile="):
            tpu_over["refine_decode_rows_per_tile"] = int(a.split("=")[1])
    cfg = load_config(overrides={
        "mask_type": "all",
        "dataset": {"img_height": H, "img_width": W},
        "tpu": tpu_over,
    })
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    refine = build_refine(cfg, static)
    if "--xla" in sys.argv:
        # A/B: force the XLA decode on the REFINE model only (stage 1 keeps
        # its shipped kernel so the two-stage line stays comparable)
        import dataclasses
        refine = dataclasses.replace(refine, use_pallas_decode=False)

    raw = synthetic_batch(0, BS, H, W)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    key = jax.random.key(0)

    inputs = jax.jit(lambda b, kk: prepare_inputs(static, b, kk, train=True))(
        batch, key)
    variables = jax.jit(lambda kk, i: model.init(
        kk, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
    lidf_out = jax.jit(lambda v, i: model.apply(
        v, i, train=False, use_gt_label=False))(variables, inputs)
    rvars = jax.jit(lambda kk, i, o: refine.init(
        kk, i, o, o["pred_pos"]))(jax.random.key(4), inputs, lidf_out)

    def t(name, fn, *args):
        ms = device_slope_time(fn, key, *args) * 1e3
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    # stage-1 forward (prep + trunk + decode)
    t("stage1 fwd (full)", lambda k, v, b: jnp.abs(model.apply(
        v, prepare_inputs(static, b, k, train=True),
        train=False, use_gt_label=False)["pred_pos"]).sum(), variables, batch)

    # one full refine iteration
    t("refine iter (full)", lambda k, rv, i, o: jnp.abs(refine.apply(
        rv, i, o, o["pred_pos"] + 0 * jax.random.uniform(k))).sum(),
      rvars, inputs, lidf_out)

    # refine PointNet re-encode alone: valid pts + injected preds
    mdl = refine  # RefineModel
    grid = static.grid

    def pnet_only(k, rv, i, o):
        pred_pos = o["pred_pos"] + 0 * jax.random.uniform(k)
        b, r, _ = pred_pos.shape
        n = static.n_valid
        ijk = grid.cell_of(pred_pos)
        inb = grid.in_bounds(ijk)
        cand = jnp.where(inb, grid.linear_id(ijk), 0)
        occ = jnp.take_along_axis(i["occupancy"], cand, axis=1)
        fallback = jnp.take_along_axis(
            i["pair_cell"], o["max_slot"][..., None], axis=2)[..., 0]
        end_cell = jnp.where(inb & occ, cand, fallback)
        end_center = grid.cell_center(grid.unlinear(end_cell), pred_pos.dtype)
        miss_rgb = jnp.take_along_axis(i["rgb"].reshape(b, -1, 3),
                                       i["miss_idx"][..., None], axis=1)
        pred_inp = jnp.concatenate([pred_pos - end_center, miss_rgb], -1)
        valid_inp = jnp.concatenate([i["vox_rel_coord"], i["valid_rgb"]], -1)
        base = jnp.arange(b, dtype=jnp.int32)[:, None] * grid.n_cells
        all_inp = jnp.concatenate([valid_inp.reshape(b * n, -1),
                                   pred_inp.reshape(b * r, -1)], 0)
        all_seg = jnp.concatenate([(base + i["vox_cell_id"]).reshape(-1),
                                   (base + end_cell).reshape(-1)], 0)
        all_ok = jnp.concatenate([i["vox_point_valid"].reshape(-1),
                                  (i["miss_slot"] & o["has_pair"]).reshape(-1)], 0)
        vf = mdl.apply(rv, all_inp, all_seg, b * grid.n_cells, valid=all_ok,
                       method=lambda m, *a, **kw: m.pnet(*a, **kw))
        return jnp.abs(vf).sum()

    t("refine pnet re-encode", pnet_only, rvars, inputs, lidf_out)

    # refine decode alone: 334-d embed -> IEF (per ray)
    pos_e0 = positional_encoding(lidf_out["pred_pos"], 8, True)
    dir_e0 = positional_encoding(inputs["miss_dir"], 4, True)
    end_feat0 = jnp.zeros(
        (*lidf_out["pred_pos"].shape[:2], int(cfg.model.pnet_out)),
        jnp.bfloat16)

    def dec_only(k, rv, ef, roi, pe, de):
        pe = pe + 0 * jax.random.uniform(k)
        embed = jnp.concatenate([ef, roi, pe, de], -1).astype(jnp.bfloat16)
        off = mdl.apply(rv, embed,
                        method=lambda m, e: m.offset_dec(e))
        return jnp.abs(off).sum()

    t("refine IEF decode", dec_only, rvars, end_feat0,
      lidf_out["roi_feat"], pos_e0, dir_e0)

    # full two-stage serving forward (bench.py's two_stage)
    fwd_times = int(cfg.refine.forward_times)

    def two_stage(k, v, rv, b):
        inp = prepare_inputs(static, b, k, train=True)
        lout = model.apply(v, inp, train=False, use_gt_label=False)
        pred = lout["pred_pos"]
        for _ in range(fwd_times):
            pred = refine.apply(rv, inp, lout, pred)
        return jnp.abs(pred).sum().astype(jnp.float32)

    t("two-stage fwd (full)", two_stage, variables, rvars, batch)


if __name__ == "__main__":
    main()

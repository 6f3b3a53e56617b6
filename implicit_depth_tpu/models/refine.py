"""RefineNet stage 2: iterative offset refinement.

Parity: reference ``RefineNet`` (src/models/pipeline.py:714-1041). Each of
``forward_times`` iterations:
  1. (train, iter 0 only) perturb the stage-1 prediction along the ray with a
     per-image scalar noise drawn from the reference's 4-bucket mixture
     (pipeline.py:926-937);
  2. re-localize each predicted point's ending voxel: the reference runs the
     pcl_aabb CUDA kernel + a scatter-max merge (pipeline.py:939-944); for a
     dense grid this is a ``floor`` — if the predicted point lands in an
     occupied in-bounds cell use it, else keep the stage-1 argmax-pair voxel
     (the reference's scatter(reduce='max') instead takes the elementwise max
     of the two voxel *indices*, an artifact of its compressed voxel list —
     we use the cleaner containment rule);
  3. inject the predicted points into the PointNet input so voxel features
     see them (pipeline.py:999-1016);
  4. re-embed (pos-enc of predicted point, ray dir, stage-1 per-ray ROI RGB
     feature — identical boxes, so it is reused rather than recomputed) and
     decode a signed offset in ``offset_range`` meters along the ray.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from implicit_depth_tpu.models.embedder import positional_encoding
from implicit_depth_tpu.models.imnet import IEF, IMNet
from implicit_depth_tpu.models.lidf import LIDFStatic
from implicit_depth_tpu.ops.masked import take_slot
from implicit_depth_tpu.models.pointnet import PointNet2Stage


def perturb_pred_pos(key: jax.Array, pred_pos: jnp.ndarray, miss_dir: jnp.ndarray,
                     perturb_prob: float = 0.8) -> jnp.ndarray:
    """Reference noise mixture (pipeline.py:926-937), one scalar per image."""
    b = pred_pos.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    apply = jax.random.uniform(k1, (b,)) < perturb_prob
    bucket = jax.random.uniform(k2, (b,))
    u = jax.random.uniform(k3, (b,))
    noise = jnp.where(
        bucket < 0.5, u * 0.05 - 0.05,
        jnp.where(bucket < 0.8, u * 0.05,
                  jnp.where(bucket < 0.9, -0.1 + u * 0.05, 0.05 + u * 0.05)))
    noise = jnp.where(apply, noise, 0.0)
    return pred_pos + noise[:, None, None] * miss_dir


class RefineModel(nn.Module):
    """One refinement iteration (get_pred_refine, pipeline.py:922-1030)."""

    static: LIDFStatic
    pnet_out: int = 128
    pnet_gf: int = 32
    imnet_gf: int = 64
    multires: int = 8
    multires_views: int = 4
    pos_encode: bool = True
    intersect_pos_type: str = "abs"
    pnet_pos_type: str = "rel"
    offdec_type: str = "IEF"
    n_iter: int = 2
    use_sigmoid: bool = False
    offset_range: tuple = (-0.2, 0.2)
    use_pallas_decode: bool = False   # fused TPU kernel for the IEF decode
    decode_rows_per_tile: int = 2000  # kernel tile (rows = rays)
    use_pallas_segmax: bool = False   # VMEM-table voxel max-pool (fwd-only)
    dtype: Any = jnp.float32

    def setup(self):
        self.pnet = PointNet2Stage(out_channels=self.pnet_out, gf_dim=self.pnet_gf,
                                   use_pallas_segmax=self.use_pallas_segmax,
                                   dtype=self.dtype)
        if self.offdec_type == "IEF":
            self.offset_dec = IEF(out_dim=1, gf_dim=self.imnet_gf, n_iter=self.n_iter,
                                  use_sigmoid=self.use_sigmoid, dtype=self.dtype)
        else:
            self.offset_dec = IMNet(out_dim=1, gf_dim=self.imnet_gf,
                                    use_sigmoid=self.use_sigmoid, dtype=self.dtype)

    def __call__(self, inputs: Dict[str, jnp.ndarray],
                 lidf_out: Dict[str, jnp.ndarray],
                 pred_pos: jnp.ndarray,
                 inject_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """inject_mask (B, R) optionally restricts which predicted points are
        injected into the PointNet input — the ``refine.use_all_pix=False``
        eval path (pipeline.py:987-996) limits injection to zero-input-depth
        pixels."""
        grid = self.static.grid
        b, r, _ = pred_pos.shape
        n = self.static.n_valid

        # -- end-voxel re-localization (pipeline.py:939-944) ----------------
        ijk = grid.cell_of(pred_pos)
        inb = grid.in_bounds(ijk)
        cand = jnp.where(inb, grid.linear_id(ijk), 0)
        # one-hot any-reduce instead of an (B, R) element gather from the
        # (B, G^3) occupancy row: per-element gathers serialize on TPU
        # (~0.8 ms per refine iteration profiled); the iota-compare fusion
        # never materializes and reduces on full lanes
        cells_iota = jnp.arange(grid.n_cells, dtype=cand.dtype)
        occ = jnp.any((cand[..., None] == cells_iota)
                      & inputs["occupancy"][:, None, :], axis=-1)
        contained = inb & occ
        fallback = take_slot(inputs["pair_cell"], lidf_out["max_slot"])
        end_cell = jnp.where(contained, cand, fallback)
        end_center = grid.cell_center(grid.unlinear(end_cell), pred_pos.dtype)

        # -- PointNet with injected predictions (pipeline.py:999-1016) ------
        miss_rgb = inputs.get("miss_rgb")
        if miss_rgb is None:  # hand-built inputs (tests/oracles)
            miss_rgb = jnp.take_along_axis(inputs["rgb"].reshape(b, -1, 3),
                                           inputs["miss_idx"][..., None], axis=1)
        if self.pnet_pos_type == "rel":
            pred_inp = jnp.concatenate([pred_pos - end_center, miss_rgb], -1)
            valid_inp = jnp.concatenate([inputs["vox_rel_coord"],
                                         inputs["valid_rgb"]], -1)
        else:
            pred_inp = jnp.concatenate([pred_pos, miss_rgb], -1)
            valid_inp = jnp.concatenate([inputs["valid_xyz"], inputs["valid_rgb"]], -1)

        base = jnp.arange(b, dtype=jnp.int32)[:, None] * grid.n_cells
        seg_valid = base + inputs["vox_cell_id"]
        seg_pred = base + end_cell
        pred_ok = inputs["miss_slot"] & lidf_out["has_pair"]
        if inject_mask is not None:
            pred_ok = pred_ok & inject_mask
        # split streams instead of one concat: ≡ the reference's joint
        # scatter (max is associative; pointnet.call_split docstring), and
        # the valid points' stage-1 MLP + scatter are iteration-invariant —
        # XLA CSEs them across the forward_times loop instead of recomputing
        # them inside a mixed [valid | pred] concat every iteration
        vox_feat = self.pnet.call_split(
            [(valid_inp.reshape(b * n, -1), seg_valid.reshape(-1),
              inputs["vox_point_valid"].reshape(-1)),
             (pred_inp.reshape(b * r, -1), seg_pred.reshape(-1),
              pred_ok.reshape(-1))], b * grid.n_cells)
        end_feat = vox_feat[seg_pred]                                # (B, R, 128)

        # -- embedding + decode (pipeline.py:1018-1029) ---------------------
        pos_inp = pred_pos - end_center if self.intersect_pos_type == "rel" else pred_pos
        pos_e = positional_encoding(pos_inp, self.multires, self.pos_encode)
        dir_e = positional_encoding(inputs["miss_dir"], self.multires_views,
                                    self.pos_encode)
        fused_ok = (self.use_pallas_decode and self.offdec_type == "IEF"
                    and self.pos_encode and not self.is_initializing())
        if fused_ok:
            # fused Pallas IEF decode (ops/pallas_ray_decode.fused_ief_rows):
            # the (N, 334) embed concat never materializes — parts go in
            # separately (rc = [roi | dir] is iteration-constant and CSEs
            # across the forward_times loop), layer 1 is split/hoisted and
            # the MLP chain runs with VMEM-resident weights
            from implicit_depth_tpu.ops.pallas_ray_decode import fused_ief_rows
            rc = jnp.concatenate([lidf_out["roi_feat"], dir_e], -1)
            off = fused_ief_rows(
                end_feat.reshape(b * r, -1).astype(self.dtype),
                rc.reshape(b * r, -1).astype(self.dtype),
                pos_e.reshape(b * r, -1).astype(self.dtype),
                self._ief_weights(), dir_e.shape[-1], self.n_iter,
                self.offset_dec.init_offset, self.use_sigmoid, self.dtype,
                self.decode_rows_per_tile,
                jax.default_backend() != "tpu").reshape(b, r)  # interpret off-TPU
        else:
            # NB: one embed concat + the decoder's internal layer-1 hoist is
            # the measured optimum for the XLA path; splitting layer 1 across
            # the four embed parts (IEF.from_parts) materializes 4 (R, 4g)
            # partial products and traced SLOWER (8.1 vs 7.1 ms for the
            # 2-iteration refine) — don't redo
            embed = jnp.concatenate([end_feat, lidf_out["roi_feat"], pos_e,
                                     dir_e], -1).astype(self.dtype)
            off = self.offset_dec(embed)[..., 0]
        lo, hi = self.offset_range
        scaled = off * (hi - lo) + lo
        return pred_pos + scaled[..., None] * inputs["miss_dir"]

    def _ief_weights(self) -> Dict[str, jnp.ndarray]:
        """Flatten the IEF params into the fused kernel's weight-dict layout
        (ops/pallas_ray_decode.fused_ief_rows)."""
        p = self.offset_dec.variables["params"]
        mlp = p["_MLP4_0"]
        w = {"enc_w": p["Dense_0"]["kernel"], "enc_b": p["Dense_0"]["bias"]}
        for i in range(4):
            w[f"w{i + 1}"] = mlp[f"Dense_{i}"]["kernel"]
            w[f"b{i + 1}"] = mlp[f"Dense_{i}"]["bias"]
        return w


def refine_forward(model: RefineModel, params, inputs, lidf_out,
                   forward_times: int, train: bool,
                   perturb_key: jax.Array | None = None,
                   perturb_prob: float = 0.8) -> jnp.ndarray:
    """forward_times iterations (pipeline.py:1032-1041); perturb iter 0 only."""
    pred = lidf_out["pred_pos"]
    for it in range(forward_times):
        if train and it == 0 and perturb_key is not None:
            pred = perturb_pred_pos(perturb_key, pred, inputs["miss_dir"], perturb_prob)
        pred = model.apply(params, inputs, lidf_out, pred)
    return pred


def refine_loss(inputs, pred_pos_refine, *, train, img_hw,
                pos_w=100.0, surf_norm_w=10.0, smooth_w=0.0,
                surf_norm_on=True, smooth_on=True,
                hard_neg=False, hard_neg_ratio=0.1) -> Dict[str, jnp.ndarray]:
    """Stage-2 loss (pipeline.py:760-919): position + normals, no prob CE."""
    from implicit_depth_tpu.models.lidf import (
        hard_neg_mean,
        masked_mean,
        surf_smooth_terms,
    )

    slot = inputs["miss_slot"]
    gt_pos = inputs["gt_pos"]
    reduce = ((lambda v, m: hard_neg_mean(v, m, hard_neg_ratio))
              if hard_neg else masked_mean)

    pos_l1 = jnp.mean(jnp.abs(pred_pos_refine - gt_pos), axis=-1)
    pos_loss = reduce(pos_l1, slot)

    # statically-gated smooth term, planar normals branch (see lidf_loss)
    surf_norm_loss, angle_err, smooth_loss = surf_smooth_terms(
        inputs, pred_pos_refine, train=train, img_hw=img_hw,
        hard_neg=hard_neg, hard_neg_ratio=hard_neg_ratio,
        want_smooth=bool(smooth_w) or smooth_on is True)

    loss_net = (pos_w * pos_loss
                + surf_norm_w * jnp.asarray(surf_norm_on, jnp.float32) * surf_norm_loss
                + smooth_w * jnp.asarray(smooth_on, jnp.float32) * smooth_loss)

    nz = (jnp.sum(jnp.abs(gt_pos), -1) != 0) & slot
    l2 = jnp.sqrt(jnp.sum((pred_pos_refine - gt_pos) ** 2, -1))
    err = masked_mean(l2, nz)
    return {
        "pos_loss": pos_loss,
        "surf_norm_loss": surf_norm_loss,
        "smooth_loss": smooth_loss,
        "loss_net": loss_net,
        "err": err,
        "angle_err": angle_err,
    }

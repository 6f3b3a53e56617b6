"""LIDF stage 1: local implicit depth function, static-shape TPU pipeline.

Parity map to the reference ``LIDF`` (src/models/pipeline.py:31-711):

  prepare_data / get_valid_points / get_occ_vox_bound / get_miss_ray /
  compute_ray_aabb / compute_gt      -> ``prepare_inputs`` (pure geometry,
                                        static shapes, no parameters)
  get_embedding / get_pred            -> ``LIDFModel.__call__``
  compute_loss                        -> ``lidf_loss``

Differences by design (see ARCHITECTURE.md):
  * occupied voxels live in a dense (B, G³) occupancy mask;
  * ray/voxel pairs live in a static (B, R, K) tensor from DDA traversal,
    so all per-ray reductions are masked row ops;
  * RGB ROI features are computed per RAY and broadcast over the K pair
    slots (the box only depends on the ray's pixel — the reference
    recomputes it per pair);
  * degenerate stages (no voxels / rays / pairs) yield masked-out slots and
    zero loss instead of the DDP consensus protocol (pipeline.py:662-701);
  * the ROI feature vector is a spatial-major permutation of the reference's
    channel-major flatten — irrelevant when training from scratch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.geometry.rays import ray_dir_map
from implicit_depth_tpu.geometry.sampling import (
    sample_masked_window,
    sample_valid_stratified,
)
from implicit_depth_tpu.geometry.voxel import VoxelGrid, voxelize_points
from implicit_depth_tpu.models.embedder import posenc_dim, positional_encoding
from implicit_depth_tpu.models.imnet import IEF, IMNet
from implicit_depth_tpu.models.pointnet import PointNet2Stage
from implicit_depth_tpu.models.resnet import ResNet34_8s
from implicit_depth_tpu.ops.masked import (
    masked_argmax,
    masked_log_softmax,
    masked_softmax,
    take_slot,
)
from implicit_depth_tpu.ops.ray_grid import ray_grid_intersect
from implicit_depth_tpu.ops.roi_align import roi_window_pool


@dataclasses.dataclass(frozen=True)
class LIDFStatic:
    """Static (python) shape/geometry configuration shared by prepare/model."""

    grid: VoxelGrid
    n_valid: int = 10000       # grid.valid_sample_num (H*W when use_all_valid)
    n_rays: int = 20000        # grid.miss_sample_num (train); H*W at eval
    k_pairs: int = 20          # tpu.max_pairs_per_ray
    roi_inp_bbox: int = 8
    roi_out_bbox: int = 2
    use_all_valid: bool = False  # grid.valid_sample_num == -1 (pipeline.py:137-140)


def prepare_inputs(static: LIDFStatic,
                   batch: Dict[str, jnp.ndarray],
                   key: jax.Array,
                   train: bool,
                   mask_type: str = "all",
                   pred_mask: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Geometry stage: sampling, voxelization, ray-grid pairs, GT labels.

    batch: rgb (B,H,W,3) standardized; xyz / xyz_corrupt (B,H,W,3);
           depth_corrupt (B,H,W); corrupt_mask / valid_mask (B,H,W) {0,1};
           fx, fy, cx, cy (B,).
    """
    grid = static.grid
    rgb = batch["rgb"]
    b, h, w, _ = rgb.shape
    corrupt_mask = batch["corrupt_mask"] > 0.5

    # --- masks (prepare_data, pipeline.py:91-135) --------------------------
    if train:
        miss_mask = corrupt_mask
        valid_mask = batch["valid_mask"] > 0.5
    elif mask_type == "pred":
        if pred_mask is None:
            raise ValueError(
                "mask_type='pred' needs a pred_mask — supply a 'pred_mask' "
                "batch key (dataset.provide_pred_mask / dataset.pred_mask_dir)")
        miss_mask = pred_mask > 0.5
        valid_mask = ~miss_mask
    else:  # 'all': every zero-input-depth pixel is a ray
        miss_mask = jnp.ones((b, h, w), bool)
        valid_mask = batch["depth_corrupt"] != 0

    k_valid, k_miss = jax.random.split(key)

    # --- valid points (get_valid_points, :137-160) -------------------------
    if static.use_all_valid:
        # valid_sample_num == -1: every valid pixel is a point (static TPU
        # form: all H*W slots, validity in the slot mask)
        vidx = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (b, h * w))
        vslot = valid_mask.reshape(b, -1)
    else:
        vidx, vslot, _ = sample_valid_stratified(valid_mask, static.n_valid, k_valid)
    take_pix = lambda img_flat, idx: jnp.take_along_axis(img_flat, idx[..., None], axis=1)
    xyz_corrupt_flat = batch["xyz_corrupt"].reshape(b, h * w, 3)
    # pair gathers that share indices: one 6-wide row gather uses 6/128
    # lanes instead of 2x 3/128 and halves the per-row gather count
    vg = take_pix(jnp.concatenate(
        [xyz_corrupt_flat, rgb.reshape(b, h * w, 3)], axis=-1), vidx)
    valid_xyz, valid_rgb = vg[..., :3], vg[..., 3:]

    # --- occupied voxels (get_occ_vox_bound, :162-201) ---------------------
    vox = voxelize_points(grid, valid_xyz, vslot)

    # --- miss rays (get_miss_ray, :203-269) --------------------------------
    dirs = ray_dir_map(h, w, batch["fx"], batch["fy"], batch["cx"], batch["cy"])
    dirs_flat = dirs.reshape(b, h * w, 3)
    if train:
        miss_mask_flat = miss_mask.reshape(b, -1)
        # rank = cumsum(mask) - 1 computed ONCE and shared with the
        # scatter-free loss-image writes (compose_pred_image) and the
        # surf-norm in-window mask — the 307k-pixel scan costs ~1.4 ms on
        # TPU and appeared 3x per step before consolidation
        miss_rank = jnp.cumsum(miss_mask_flat.astype(jnp.int32), axis=1) - 1
        midx, mslot, _, mstart = sample_masked_window(
            miss_mask_flat, static.n_rays, k_miss, rank=miss_rank)
    else:
        midx = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (b, h * w))
        mslot = miss_mask.reshape(b, -1)
        mstart = jnp.zeros((b,), jnp.int32)
        miss_mask_flat = mslot
        miss_rank = None
    mg = take_pix(jnp.concatenate(
        [dirs_flat, batch["xyz"].reshape(b, h * w, 3),
         rgb.reshape(b, h * w, 3)], axis=-1), midx)
    miss_dir, gt_pos, miss_rgb = mg[..., :3], mg[..., 3:6], mg[..., 6:]
    miss_px = (midx % w).astype(jnp.int32)
    miss_py = (midx // w).astype(jnp.int32)

    # --- ray/voxel pairs (compute_ray_aabb, :271-296) ----------------------
    pairs = ray_grid_intersect(grid, miss_dir, vox["occupancy"],
                               static.k_pairs, ray_mask=mslot)

    # --- ground truth (compute_gt, :298-336): point-in-voxel is a floor ----
    gt_ijk = grid.cell_of(gt_pos)
    gt_in = grid.in_bounds(gt_ijk)
    gt_cell = jnp.where(gt_in, grid.linear_id(gt_ijk), -1)
    pair_label = pairs["valid"] & (pairs["cell_id"] == gt_cell[..., None])

    out = {} if miss_rank is None else {"miss_rank": miss_rank}
    out.update({
        "rgb": rgb,
        "xyz_flat": batch["xyz"].reshape(b, h * w, 3),
        "xyz_corrupt_flat": xyz_corrupt_flat,
        "corrupt_mask": batch["corrupt_mask"],
        "valid_xyz": valid_xyz,
        "valid_rgb": valid_rgb,
        "valid_slot": vslot,
        "valid_idx": vidx,
        "vox_cell_id": vox["cell_id"],
        "vox_point_valid": vox["valid"],
        "vox_rel_coord": vox["rel_coord"],
        "occupancy": vox["occupancy"],
        "miss_idx": midx,
        "miss_slot": mslot,
        "miss_mask_flat": miss_mask_flat,
        "miss_start": mstart,
        "miss_dir": miss_dir,
        "miss_rgb": miss_rgb,
        "miss_px": miss_px,
        "miss_py": miss_py,
        "pair_cell": pairs["cell_id"],
        "pair_valid": pairs["valid"],
        "t_enter": pairs["t_enter"],
        "t_exit": pairs["t_exit"],
        "gt_pos": gt_pos,
        "pair_label": pair_label,
    })
    return out


class LIDFModel(nn.Module):
    """Parameterized stage-1 compute (get_embedding + get_pred)."""

    static: LIDFStatic
    rgb_out: int = 32
    pnet_out: int = 128
    pnet_gf: int = 32
    imnet_gf: int = 64
    multires: int = 8
    multires_views: int = 4
    pos_encode: bool = True
    intersect_pos_type: str = "abs"   # 'abs' | 'rel' (pipeline.py:355-360)
    offdec_type: str = "IEF"
    n_iter: int = 2
    use_sigmoid: bool = False
    offset_range: tuple = (0.0, 1.0)
    resnet_stages: tuple = (3, 4, 6, 3)
    pairs_budget: int = 0   # avg pair slots/ray to decode after compaction; 0 = dense
    pairs_budget_mode: str = "per_ray"  # 'per_ray' truncation | 'global' compaction
    use_pallas_decode: bool = False  # fused TPU kernel for the pair decode
    decode_rays_per_tile: int = 128  # serving-kernel tile (rays); vmem_limit
                                     # raise in the kernel covers rows>512
    decode_train_rays_per_tile: int = 192  # table-mode (training) tile —
                                     # measured best on v5e (57.1 vs 58.8 ms
                                     # serial step at 128/256)
    decode_bwd: str = "xla"          # fused-kernel backward: 'xla' recompute
                                     # under jax.vjp | 'kernel' fused Pallas
    decode_serve_table: bool = False  # serving decode via the per-image-table
                                      # kernel (in-kernel one-hot voxel lookup)
                                      # instead of pre-gathered rows
    remat_backbone: bool = False  # jax.checkpoint the ResNet (trade FLOPs for HBM)
    use_pallas_segmax: bool = False  # VMEM-table voxel max-pool (fwd-only)
    dtype: Any = jnp.float32

    def setup(self):
        resnet_cls = (nn.remat(ResNet34_8s, static_argnums=(2,))
                      if self.remat_backbone else ResNet34_8s)
        self.resnet = resnet_cls(out_ch=self.rgb_out, stage_sizes=self.resnet_stages,
                                 dtype=self.dtype)
        self.pnet = PointNet2Stage(out_channels=self.pnet_out, gf_dim=self.pnet_gf,
                                   use_pallas_segmax=self.use_pallas_segmax,
                                   dtype=self.dtype)
        if self.offdec_type == "IEF":
            self.offset_dec = IEF(out_dim=1, gf_dim=self.imnet_gf, n_iter=self.n_iter,
                                  use_sigmoid=self.use_sigmoid, dtype=self.dtype)
        else:
            self.offset_dec = IMNet(out_dim=1, gf_dim=self.imnet_gf,
                                    use_sigmoid=self.use_sigmoid, dtype=self.dtype)
        self.prob_dec = IMNet(out_dim=1, gf_dim=self.imnet_gf,
                              use_sigmoid=self.use_sigmoid, dtype=self.dtype)

    def voxel_features(self, inputs) -> jnp.ndarray:
        """(B*G³, pnet_out) voxel features from the sampled valid points."""
        grid = self.static.grid
        b = inputs["valid_xyz"].shape[0]
        pnet_inp = jnp.concatenate([inputs["vox_rel_coord"], inputs["valid_rgb"]], -1)
        seg = (jnp.arange(b, dtype=jnp.int32)[:, None] * grid.n_cells
               + inputs["vox_cell_id"])
        return self.pnet(pnet_inp.reshape(b * self.static.n_valid, -1),
                         seg.reshape(-1), b * grid.n_cells,
                         valid=inputs["vox_point_valid"].reshape(-1))

    def _embed_and_decode(self, pair_vox, roi_rows, enter, leave, dir_rows):
        """Shared tail: concat the 385-d embedding, run both decoders.

        All args are (..., C) with matching leading shape. When
        ``use_pallas_decode`` is set (and the rows are compacted 2-D), the
        fused TPU kernel computes posenc + both MLPs without materializing
        the embedding in HBM (ops/pallas_decode.py).
        """
        fused_ok = self.pos_encode and self.offdec_type == "IEF"
        if fused_ok and not self.is_initializing():
            from implicit_depth_tpu.ops.pallas_decode import (
                fused_pair_decode,
                xla_pair_decode,
            )
            lead = pair_vox.shape[:-1]
            rows = lambda x: x.reshape(-1, x.shape[-1])
            kw = {}
            if self.use_pallas_decode:
                fn = fused_pair_decode
                kw["interpret"] = jax.default_backend() != "tpu"
            else:
                fn = xla_pair_decode
            off, logit = fn(rows(pair_vox), rows(roi_rows), rows(enter),
                            rows(leave), rows(dir_rows),
                            self._decoder_weights(), multires=self.multires,
                            n_iter=self.n_iter, use_sigmoid=self.use_sigmoid,
                            dtype=self.dtype, **kw)
            return off.reshape(lead), logit.reshape(lead)
        enter_e = positional_encoding(enter, self.multires, self.pos_encode)
        leave_e = positional_encoding(leave, self.multires, self.pos_encode)
        embed = jnp.concatenate(
            [pair_vox, roi_rows, enter_e, leave_e, dir_rows],
            axis=-1).astype(self.dtype)
        pred_offset = self.offset_dec(embed)[..., 0]
        prob_logit = self.prob_dec(embed)[..., 0]
        return pred_offset, prob_logit

    def _decoder_weights(self) -> Dict[str, jnp.ndarray]:
        """Flatten the IEF offset + IMNet prob decoder params into the
        kernel's weight-dict layout."""
        ief = self.offset_dec.variables["params"]
        prob = self.prob_dec.variables["params"]
        w = {"off_enc_w": ief["Dense_0"]["kernel"],
             "off_enc_b": ief["Dense_0"]["bias"]}
        for i in range(4):
            w[f"off_w{i + 1}"] = ief["_MLP4_0"][f"Dense_{i}"]["kernel"]
            w[f"off_b{i + 1}"] = ief["_MLP4_0"][f"Dense_{i}"]["bias"]
            w[f"prob_w{i + 1}"] = prob["_MLP4_0"][f"Dense_{i}"]["kernel"]
            w[f"prob_b{i + 1}"] = prob["_MLP4_0"][f"Dense_{i}"]["bias"]
        return w

    def _decode_ray_major(self, inputs, vox_feat, roi, dir_e,
                          use_kernel: bool, train: bool = False):
        """Ray-major decode (ops/pallas_ray_decode.py): contiguous (B, R, Kb)
        slots, per-ray features' layer-1 computed once per ray, lane-packed
        posenc. ``use_kernel`` picks the fused Pallas kernel (everything in
        VMEM, posenc in-register) vs the identical-math XLA path. Used by the
        per_ray budget mode.

        Kernel path split: SERVING (train=False) feeds pre-gathered voxel
        rows (`fused_ray_decode` — no ray padding, fastest fwd); TRAINING
        uses the per-image-table variant whose fused backward folds d_table
        in-kernel (no scatter-add) — worth ~8 ms/step against a ~0.6 ms fwd
        cost (BASELINE.md scatter-elimination table)."""
        from implicit_depth_tpu.ops.pallas_ray_decode import (
            fused_ray_decode,
            fused_ray_decode_table,
            pack_pair_pos,
            xla_ray_decode,
        )

        grid = self.static.grid
        b, r, kb = inputs["pair_valid"].shape

        def make_pos_rk(inp, n_rays):
            # ray-major lane-packed positions (kernel operands must be
            # lane-dense — see ops/pallas_ray_decode.pack_pair_pos); the
            # geometry has no parameter ancestry, so cut its cotangent graph
            enter, leave = self._pair_positions(inp)
            return jax.lax.stop_gradient(
                pack_pair_pos(enter, leave).reshape(b * n_rays, kb * 6))

        ray_feat = jnp.concatenate([roi, dir_e], -1).reshape(b * r, -1)
        if use_kernel and not train and not self.decode_serve_table:
            pos = make_pos_rk(inputs, r)
            global_cell = (jnp.arange(b, dtype=jnp.int32)[:, None, None]
                           * grid.n_cells + inputs["pair_cell"])
            pair_vox = vox_feat[global_cell].reshape(b * r * kb, -1)
            off, logit = fused_ray_decode(
                pair_vox.astype(self.dtype), pos, ray_feat.astype(self.dtype),
                self._decoder_weights(), kb, self.multires, self.n_iter,
                0.001, self.use_sigmoid, self.dtype,
                self.decode_rays_per_tile,
                jax.default_backend() != "tpu",  # interpret off-TPU
                self.decode_bwd)
            return off.reshape(b, r, kb), logit.reshape(b, r, kb)
        elif use_kernel:
            # per-image table mode: the voxel-feature lookup AND its
            # cotangent live inside the kernel (one-hot MXU against the
            # image's (G³, Cv) table block) — no gathered (N·kb, Cv) rows in
            # HBM, no scatter-add in the backward. Tiles must not straddle
            # images and Mosaic needs the ray-block sublane dim %8==0, so the
            # ray dim is padded per image to a tile multiple (masked rows
            # decode garbage and are sliced off).
            t_cfg = (self.decode_train_rays_per_tile if train
                     else self.decode_rays_per_tile)
            t = max(8, (min(t_cfg, r) // 8) * 8)
            r_pad = -(-r // t) * t
            inp_k = inputs
            rayf = ray_feat.reshape(b, r, -1).astype(self.dtype)
            if r_pad != r:
                # pad the SMALL per-ray inputs (t/dir/cell, ~7 MB) and build
                # the (B, r_pad, kb, 8) position tensor directly at the
                # padded size — padding the assembled f32 positions instead
                # costs a ~1 ms 41 MB pad pass (profiled)
                padr = ((0, 0), (0, r_pad - r))
                inp_k = dict(inputs)
                for k3 in ("pair_cell", "t_enter", "t_exit"):
                    inp_k[k3] = jnp.pad(inputs[k3], padr + ((0, 0),))
                inp_k["miss_dir"] = jnp.pad(inputs["miss_dir"],
                                            padr + ((0, 0),))
                rayf = jnp.pad(rayf, padr + ((0, 0),))
            cells = jax.lax.stop_gradient(
                inp_k["pair_cell"].reshape(b * r_pad, kb))
            pos_rk = make_pos_rk(inp_k, r_pad)
            # per-image table blocks also need %8 sublane rows (G³=729→736);
            # local ids never reach the pad rows, pad-vjp slices d_table back
            nc = grid.n_cells
            nc_pad = -(-nc // 8) * 8
            table = vox_feat.reshape(b, nc, -1)
            if nc_pad != nc:
                table = jnp.pad(table, ((0, 0), (0, nc_pad - nc), (0, 0)))
            off, logit = fused_ray_decode_table(
                cells, pos_rk,
                rayf.reshape(b * r_pad, -1).astype(self.dtype),
                table.reshape(b * nc_pad, -1).astype(self.dtype),
                self._decoder_weights(), kb, r_pad // t, self.multires,
                self.n_iter, 0.001, self.use_sigmoid, self.dtype, t,
                jax.default_backend() != "tpu",  # interpret off-TPU
                self.decode_bwd)
            off = off.reshape(b, r_pad, kb)[:, :r]
            logit = logit.reshape(b, r_pad, kb)[:, :r]
            return off, logit
        else:
            enter, leave = self._pair_positions(inputs)
            pos = jnp.concatenate([enter, leave],
                                  axis=-1).astype(jnp.float32)
            global_cell = (jnp.arange(b, dtype=jnp.int32)[:, None, None]
                           * grid.n_cells + inputs["pair_cell"])
            pair_vox = vox_feat[global_cell].reshape(b * r * kb, -1)
            off, logit = xla_ray_decode(
                pair_vox.astype(self.dtype), pos.reshape(b * r * kb, 6),
                ray_feat.astype(self.dtype),
                self._decoder_weights(), kb=kb, multires=self.multires,
                n_iter=self.n_iter, use_sigmoid=self.use_sigmoid,
                dtype=self.dtype)
        return off.reshape(b, r, kb), logit.reshape(b, r, kb)

    def _pair_positions(self, inputs):
        grid = self.static.grid
        dirs = inputs["miss_dir"]
        enter = dirs[:, :, None, :] * inputs["t_enter"][..., None]
        leave = dirs[:, :, None, :] * inputs["t_exit"][..., None]
        if self.intersect_pos_type == "rel":
            center = grid.cell_center(grid.unlinear(inputs["pair_cell"]))
            enter, leave = enter - center, leave - center
        return enter, leave

    def _decode_dense(self, inputs, vox_feat, roi, dir_e):
        """Decode every (B, R, K) slot (padding included)."""
        grid = self.static.grid
        b, r, k = inputs["pair_valid"].shape
        global_cell = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * grid.n_cells
                       + inputs["pair_cell"])
        pair_vox = vox_feat[global_cell]
        enter, leave = self._pair_positions(inputs)
        return self._embed_and_decode(
            pair_vox,
            jnp.broadcast_to(roi[:, :, None, :], (b, r, k, roi.shape[-1])),
            enter, leave,
            jnp.broadcast_to(dir_e[:, :, None, :], (b, r, k, dir_e.shape[-1])))

    def _decode_compacted(self, inputs, vox_feat, roi, dir_e):
        """Decode only valid pairs, compacted to a static budget.

        The (B, R, K) slots are mostly padding (a ray crosses ~4-8 occupied
        cells out of K). Valid pairs are compacted into P = B·R·pairs_budget
        rows — dropping the farthest-K pairs of each ray first if the budget
        overflows — decoded, and the two scalars scattered back. Cuts the
        per-pair MLP (the FLOPs hot spot, SURVEY.md §3.3) by ~K/budget with
        identical results for every kept pair.
        """
        grid = self.static.grid
        b, r, k = inputs["pair_valid"].shape
        n_slots = b * r * k
        p = min(b * r * self.pairs_budget, n_slots)

        # k-major cumsum rank: all slot-0 (nearest) pairs rank before any
        # slot-1 pair, so a budget overflow drops the farthest-K pairs
        # globally — no sort needed.
        valid_km = inputs["pair_valid"].transpose(2, 0, 1).reshape(-1)  # (K·B·R)
        rank = jnp.cumsum(valid_km.astype(jnp.int32)) - 1
        rank = jnp.where(valid_km & (rank < p), rank, p)
        km_idx = jnp.arange(n_slots, dtype=jnp.int32)
        sel = jnp.full(p, n_slots, jnp.int32).at[rank].set(
            km_idx, mode="drop", unique_indices=True, indices_are_sorted=True)
        sel_valid = sel < n_slots
        sel = jnp.where(sel_valid, sel, 0)
        sel_k = sel // (b * r)                    # pair slot index
        sel_ray = sel % (b * r)                   # flat b*R + r
        row = sel_ray * k + sel_k                 # row-major (B,R,K) position

        flat = lambda x: x.reshape(n_slots, *x.shape[3:])
        cell = flat(inputs["pair_cell"])[row]
        bidx = sel_ray // r
        pair_vox = vox_feat[bidx * grid.n_cells + cell]
        enter, leave = self._pair_positions(inputs)
        enter_s = flat(enter)[row]
        leave_s = flat(leave)[row]
        roi_s = roi.reshape(b * r, -1)[sel_ray]
        dir_s = dir_e.reshape(b * r, -1)[sel_ray]

        off_s, logit_s = self._embed_and_decode(pair_vox, roi_s, enter_s,
                                                leave_s, dir_s)
        off_s = jnp.where(sel_valid, off_s, 0.0)
        logit_s = jnp.where(sel_valid, logit_s, 0.0)
        row_w = jnp.where(sel_valid, row, n_slots)
        pred_offset = jnp.zeros((n_slots,), off_s.dtype).at[row_w].set(
            off_s, mode="drop", unique_indices=True).reshape(b, r, k)
        prob_logit = jnp.zeros((n_slots,), logit_s.dtype).at[row_w].set(
            logit_s, mode="drop", unique_indices=True).reshape(b, r, k)
        # decoded-slot mask: budget-dropped pairs must not compete in the
        # per-ray softmax/argmax with a phantom logit of 0
        decoded = jnp.zeros((n_slots,), bool).at[row_w].set(
            sel_valid, mode="drop", unique_indices=True).reshape(b, r, k)
        return pred_offset, prob_logit, decoded

    def trunk(self, inputs: Dict[str, jnp.ndarray], train: bool):
        """Per-image work shared by all rays: RGB backbone + voxel features.
        Split out so eval can chunk the ray dimension (tpu.eval_rays_per_chunk)
        without recomputing the backbone per chunk."""
        # (train passed positionally: nn.remat static_argnums=(2,))
        feat_map = self.resnet(inputs["rgb"], train)
        vox_feat = self.voxel_features(inputs)
        return feat_map, vox_feat

    def decode_rays(self, inputs: Dict[str, jnp.ndarray],
                    feat_map: jnp.ndarray, vox_feat: jnp.ndarray,
                    train: bool, use_gt_label) -> Dict[str, jnp.ndarray]:
        """Per-ray work: ROI pooling, pair decode, per-ray argmax/softmax.
        ``inputs`` may carry any subset of the rays (chunked eval)."""
        grid = self.static.grid
        b, r, k = inputs["pair_valid"].shape

        # per-ray ROI feature (broadcast over K pair slots)
        pix_xy = jnp.stack([inputs["miss_px"], inputs["miss_py"]], axis=-1)
        bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, r))
        roi = roi_window_pool(feat_map, pix_xy, bidx,
                              inp_bbox=self.static.roi_inp_bbox,
                              out_bbox=self.static.roi_out_bbox)
        roi = roi.reshape(b, r, -1)                               # (B, R, 128)

        dirs = inputs["miss_dir"]
        dir_e = positional_encoding(dirs, self.multires_views, self.pos_encode)

        if self.pairs_budget > 0 and self.pairs_budget_mode == "per_ray" \
                and self.pairs_budget < k:
            # Per-ray truncation: the DDA pair slots are t-sorted and
            # front-packed (ops/ray_grid.py), so the first `budget` slots ARE
            # each ray's nearest pairs. Decoding that dense (B, R, budget)
            # block needs no compaction indices, no gather/scatter, and every
            # tensor feeding the decode stays contiguous — the layout the
            # fused kernel wants. Rays with more pairs lose their farthest
            # ones (the global mode drops farthest-K globally instead).
            kb = self.pairs_budget
            sliced = dict(inputs)
            for key in ("pair_cell", "pair_valid", "t_enter", "t_exit"):
                sliced[key] = inputs[key][:, :, :kb]
            ray_major_ok = (self.pos_encode and self.offdec_type == "IEF"
                            and not self.is_initializing())
            if ray_major_ok:
                off_b, logit_b = self._decode_ray_major(
                    sliced, vox_feat, roi, dir_e,
                    use_kernel=self.use_pallas_decode, train=train)
            else:
                off_b, logit_b = self._decode_dense(sliced, vox_feat, roi, dir_e)
            # every downstream per-ray competition (softmax/argmax/CE/position
            # algebra) runs at the kb kept slots — padding the outputs back to
            # K would carry K−kb dead lanes through the whole tail AND its
            # backward (profiled at ~5 ms/step for K=20, kb=8); consumers see
            # (B, R, kb) output shapes and lidf_loss slices pair_label to match
            pred_offset, prob_logit = off_b, logit_b
            pair_valid = sliced["pair_valid"]
            t_enter_k = sliced["t_enter"]
            pair_label_k = inputs["pair_label"][:, :, :kb]
        elif self.pairs_budget > 0 and self.pairs_budget_mode == "global":
            pred_offset, prob_logit, decoded = self._decode_compacted(
                inputs, vox_feat, roi, dir_e)
            # pairs dropped by the budget are removed from all per-ray
            # competitions (they have no real logits)
            pair_valid = inputs["pair_valid"] & decoded
            t_enter_k = inputs["t_enter"]
            pair_label_k = inputs["pair_label"]
        else:
            pred_offset, prob_logit = self._decode_dense(
                inputs, vox_feat, roi, dir_e)
            pair_valid = inputs["pair_valid"]
            t_enter_k = inputs["t_enter"]
            pair_label_k = inputs["pair_label"]

        lo, hi = self.offset_range
        c_off = np.sqrt(3.0) * grid.part_size

        # Termination voxel: softmax over detached logits; GT-label argmax
        # during the curriculum (maxpool_label_epo).
        prob_softmax = masked_softmax(jax.lax.stop_gradient(prob_logit),
                                      pair_valid)
        gt_slot, _ = masked_argmax(pair_label_k.astype(jnp.float32),
                                   pair_valid)
        pr_slot, has_pair = masked_argmax(prob_softmax, pair_valid)
        use_gt = jnp.asarray(use_gt_label) & jnp.asarray(train)
        max_slot = jnp.where(use_gt, gt_slot, pr_slot)

        # Select-then-compute: pick the winning slot's scalar t/offset and
        # form the position per RAY. Computing per-pair positions first and
        # gathering the (B, R, K, 3) result costs a (B·R·K, 3) scatter in the
        # backward (profiled 3.7 ms/step) for the same value:
        # enter + off·c·dir = dir·(t_sel + scaled_sel). take_slot: the
        # element gather itself profiled at 0.9 ms per (B, R) pick.
        t_sel = take_slot(t_enter_k, max_slot)
        off_sel = take_slot(pred_offset, max_slot)
        scaled_sel = (off_sel * (hi - lo) + lo) * c_off
        pred_pos = dirs * (t_sel + scaled_sel)[..., None]
        pred_pos = jnp.where(has_pair[..., None], pred_pos, 0.0)  # dummy row ≙ :452-454

        # per-pair positions for oracle/debug consumers (DCE'd when unused)
        scaled = (pred_offset * (hi - lo) + lo) * c_off
        pair_pred_pos = (dirs[:, :, None, :] * t_enter_k[..., None]
                         + scaled[..., None] * dirs[:, :, None, :])

        return {
            "roi_feat": roi,
            "prob_logit": prob_logit,
            "prob_softmax": prob_softmax,
            "pair_valid": pair_valid,
            "pair_pred_pos": pair_pred_pos,
            "max_slot": max_slot,
            "has_pair": has_pair,
            "pred_pos": pred_pos,
        }

    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool,
                 use_gt_label) -> Dict[str, jnp.ndarray]:
        feat_map, vox_feat = self.trunk(inputs, train)
        out = self.decode_rays(inputs, feat_map, vox_feat, train, use_gt_label)
        return {**out, "feat_map": feat_map, "vox_feat": vox_feat}


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(jnp.where(mask, x, 0.0))
    den = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    return num / den


def hard_neg_mean(x: jnp.ndarray, mask: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Mean of the top-``ratio`` fraction of masked values.

    Under GSPMD jit the arrays are global, so this IS the distributed
    hard-negative top-k (the reference only does a per-rank local top-k,
    pipeline.py:475-478).
    """
    flat = jnp.where(mask, x, -jnp.inf).reshape(-1)
    k = max(int(flat.shape[0] * ratio), 1)
    top, _ = jax.lax.top_k(flat, k)
    ok = jnp.isfinite(top)
    return jnp.sum(jnp.where(ok, top, 0.0)) / jnp.maximum(jnp.sum(ok), 1)


def scatter_into_image(base_flat: jnp.ndarray, idx: jnp.ndarray,
                       slot: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Write values into (B, H*W, C) at per-image flat indices, masked."""
    hw = base_flat.shape[1]
    safe_idx = jnp.where(slot, idx, hw)  # out-of-bounds rows are dropped
    return jax.vmap(lambda img, i, v: img.at[i].set(
        v, mode="drop", unique_indices=True))(base_flat, safe_idx, values)


@jax.custom_vjp
def _compose_window(base_flat, values, mask_flat, rank, start, idx, slot):
    """``scatter_into_image`` for WINDOW-sampled indices, scatter-free.

    ``sample_masked_window`` hands out slots [start, start+R) of the mask's
    nonzero list in raster order, so slot j of ``values`` belongs to the
    pixel whose mask rank is start+j — pixel→slot is pure cumsum algebra and
    the write becomes ONE row gather + select (TPU scatters serialize per
    update; gathers vectorize — see BASELINE.md pathology table). The custom
    VJP keeps the backward gather-only too (autodiff of the gather would
    reintroduce a scatter-add).
    """
    out, _ = _compose_window_impl(base_flat, values, mask_flat, rank, start)
    return out


def window_in_mask(mask_flat, rank, start, r):
    """(B, M) bool: mask pixel whose rank falls in the window
    [start, start+r) — i.e. the exact pixel set the r ray slots cover.
    ``rank`` is cumsum(mask)-1 (precomputed once, inputs["miss_rank"])."""
    j = rank - start[:, None]
    return mask_flat & (j >= 0) & (j < r)


def _compose_window_impl(base_flat, values, mask_flat, rank, start):
    r = values.shape[1]
    j = rank - start[:, None]
    in_win = window_in_mask(mask_flat, rank, start, r)
    vals = jnp.take_along_axis(values, jnp.clip(j, 0, r - 1)[..., None], axis=1)
    return jnp.where(in_win[..., None], vals, base_flat), in_win


def _compose_window_fwd(base_flat, values, mask_flat, rank, start, idx, slot):
    out, in_win = _compose_window_impl(base_flat, values, mask_flat, rank, start)
    return out, (in_win, idx, slot)


def _compose_window_bwd(res, d):
    import numpy as onp
    in_win, idx, slot = res
    d_base = jnp.where(in_win[..., None], 0.0, d)
    # value row j is consumed by exactly one pixel — its own (idx[j]) — so
    # the cotangent is a gather at miss_idx, masked by slot validity
    d_vals = jnp.where(slot[..., None],
                       jnp.take_along_axis(d, idx[..., None], axis=1), 0.0)
    f0 = lambda x: onp.zeros(x.shape, jax.dtypes.float0)
    return (d_base, d_vals, f0(in_win), f0(in_win),
            f0(idx[:, 0]), f0(idx), f0(slot))


_compose_window.defvjp(_compose_window_fwd, _compose_window_bwd)


def compose_pred_image(base_flat: jnp.ndarray, values: jnp.ndarray,
                       inputs: Dict[str, jnp.ndarray], train: bool) -> jnp.ndarray:
    """Loss-path image write: ≡ ``scatter_into_image(base, miss_idx,
    miss_slot, values)`` but gather-only. Train mode uses the window-rank
    form; eval rays are pixel-aligned (``miss_idx == arange(H*W)``,
    prepare_inputs) so the write is a plain select."""
    if "miss_mask_flat" not in inputs:  # hand-built inputs (tests/oracles)
        return scatter_into_image(base_flat, inputs["miss_idx"],
                                  inputs["miss_slot"], values)
    if not train:
        return jnp.where(inputs["miss_slot"][..., None], values, base_flat)
    rank = inputs.get("miss_rank")
    if rank is None:
        rank = jnp.cumsum(inputs["miss_mask_flat"].astype(jnp.int32), 1) - 1
    return _compose_window(base_flat, values, inputs["miss_mask_flat"], rank,
                           inputs["miss_start"], inputs["miss_idx"],
                           inputs["miss_slot"])


def surf_smooth_terms(inputs: Dict[str, jnp.ndarray], pred_pos: jnp.ndarray,
                      *, train: bool, img_hw: tuple, hard_neg: bool,
                      hard_neg_ratio: float, want_smooth: bool):
    """Surface-normal + smoothness loss terms (pipeline.py:492-546), shared
    by ``lidf_loss`` and ``refine_loss``.

    Returns (surf_norm_loss, angle_err, smooth_loss); smooth_loss is 0.0 when
    ``want_smooth`` is False (the gathers/reductions are statically gated).

    TPU path: every image tensor here is (…, 3)-minor; NHWC leaves 125 of
    the 128 VPU lanes idle on every elementwise op of the branch. The loss
    images are therefore transposed ONCE to channel-planar (B, 3, H, W)
    (the reference's own NCHW layout, point_utils.py:210-235), the normals/
    cos/dist algebra runs on (B, H, W) planes, and the per-ray gathers
    disappear: the miss rays are exactly the in-window pixels, so the
    masked-mean over ray slots equals the masked-mean over the in-window
    pixel mask (hard-neg top-k is defined over ray slots — that path still
    gathers per-ray scalars, which is cheap).

    Hand-built inputs without ``miss_mask_flat`` (oracle/parity tests) use
    the original NHWC slot-gather form.
    """
    from implicit_depth_tpu.geometry.normals import (
        surface_normals,
        surface_normals_planar,
    )

    h, w = img_hw
    slot = inputs["miss_slot"]
    b = slot.shape[0]
    reduce = ((lambda v, m: hard_neg_mean(v, m, hard_neg_ratio))
              if hard_neg else masked_mean)
    base = inputs["xyz_flat"] if train else inputs["xyz_corrupt_flat"]
    # train: gt_pos IS take(xyz_flat, miss_idx) (prepare_inputs), so writing
    # it back into xyz_flat is the identity — skip the write entirely
    gt_rows = base if train else compose_pred_image(
        base, inputs["gt_pos"], inputs, train)
    pr_rows = compose_pred_image(base, pred_pos, inputs, train)

    if "miss_mask_flat" not in inputs:  # hand-built inputs (tests/oracles)
        gt_n, _, _ = surface_normals(gt_rows.reshape(b, h, w, 3))
        pr_n, dx, dy = surface_normals(pr_rows.reshape(b, h, w, 3))
        take = lambda img_flat: jnp.take_along_axis(
            img_flat, inputs["miss_idx"][..., None], axis=1)
        cos = jnp.sum(take(gt_n.reshape(b, -1, 3))
                      * take(pr_n.reshape(b, -1, 3)), -1)
        surf = reduce((1.0 - cos) / 2.0, slot)
        angle = masked_mean(jnp.arccos(jnp.clip(cos, -1, 1)), slot) / np.pi * 180.0
        if want_smooth:
            dx2 = take(jnp.sum(dx * dx, -1).reshape(b, -1, 1))[..., 0]
            dy2 = take(jnp.sum(dy * dy, -1).reshape(b, -1, 1))[..., 0]
            smooth = reduce(dx2, slot) + reduce(dy2, slot)
        else:
            smooth = jnp.float32(0.0)
        return surf, angle, smooth

    to_pl = lambda rows: rows.reshape(b, h, w, 3).transpose(0, 3, 1, 2)
    gt_n, _, _ = surface_normals_planar(to_pl(gt_rows))
    pr_n, dx, dy = surface_normals_planar(to_pl(pr_rows))
    cos_img = jnp.sum(gt_n * pr_n, axis=1).reshape(b, h * w)
    dist_img = (1.0 - cos_img) / 2.0
    if train:
        # the miss rays are window slots [start, start+R) of the mask's
        # nonzero list (sample_masked_window) — recover the pixel set
        rank = inputs.get("miss_rank")
        if rank is None:
            rank = jnp.cumsum(inputs["miss_mask_flat"].astype(jnp.int32), 1) - 1
        in_win = window_in_mask(inputs["miss_mask_flat"], rank,
                                inputs["miss_start"], slot.shape[1])
    else:
        in_win = slot  # eval rays are pixel-aligned (miss_idx == arange)
    angle = (masked_mean(jnp.arccos(jnp.clip(cos_img, -1, 1)), in_win)
             / np.pi * 180.0)
    if want_smooth:
        dx2 = jnp.sum(dx * dx, axis=1).reshape(b, -1)
        dy2 = jnp.sum(dy * dy, axis=1).reshape(b, -1)
    if hard_neg:
        # hard-neg top-k is defined over the (B·R) ray slots — keep those
        # semantics with per-ray scalar gathers of the plane values
        take1 = lambda im: jnp.take_along_axis(im, inputs["miss_idx"], axis=1)
        surf = reduce(take1(dist_img), slot)
        smooth = (reduce(take1(dx2), slot) + reduce(take1(dy2), slot)
                  if want_smooth else jnp.float32(0.0))
    else:
        surf = masked_mean(dist_img, in_win)
        smooth = (masked_mean(dx2, in_win) + masked_mean(dy2, in_win)
                  if want_smooth else jnp.float32(0.0))
    return surf, angle, smooth


def lidf_loss(inputs: Dict[str, jnp.ndarray],
              outputs: Dict[str, jnp.ndarray],
              *,
              train: bool,
              img_hw: tuple,
              pos_w: float = 100.0,
              prob_w: float = 0.5,
              surf_norm_w: float = 10.0,
              smooth_w: float = 0.0,
              surf_norm_on=True,
              smooth_on=True,
              hard_neg: bool = False,
              hard_neg_ratio: float = 0.1) -> Dict[str, jnp.ndarray]:
    """compute_loss parity (pipeline.py:468-567) with masked static shapes."""
    slot = inputs["miss_slot"]
    gt_pos, pred_pos = inputs["gt_pos"], outputs["pred_pos"]

    reduce = ((lambda v, m: hard_neg_mean(v, m, hard_neg_ratio))
              if hard_neg else masked_mean)

    # position L1 (pipeline.py:471-478)
    pos_l1 = jnp.mean(jnp.abs(pred_pos - gt_pos), axis=-1)
    pos_loss = reduce(pos_l1, slot)

    # per-ray termination CE (pipeline.py:480-490); the mask excludes pairs
    # the compaction budget dropped (outputs["pair_valid"])
    pair_valid = outputs.get("pair_valid", inputs["pair_valid"])
    # per-ray budget outputs carry only the kb kept slots (decode_rays) —
    # slice the label to match; dropped-slot labels are excluded exactly as
    # the padded form excluded them via pair_valid=False
    pair_label = inputs["pair_label"][..., :pair_valid.shape[-1]]
    log_sm = masked_log_softmax(outputs["prob_logit"], pair_valid)
    has_label = jnp.any(pair_label & pair_valid, axis=-1)
    gt_slot, _ = masked_argmax(pair_label.astype(jnp.float32),
                               pair_valid)
    ce = -take_slot(log_sm, gt_slot)  # element gather profiled 0.8 ms
    prob_loss = reduce(ce, slot & has_label)

    # surface-normal + smoothness (pipeline.py:492-546). The smooth term is
    # statically gated: smooth_w is a config float and its gathers/reductions
    # are real per-step cost when off. A literal smooth_on=True (oracle/
    # parity callers) still computes the metric; the trainers pass a traced
    # epoch flag, which defers to the weight.
    surf_norm_loss, angle_err, smooth_loss = surf_smooth_terms(
        inputs, pred_pos, train=train, img_hw=img_hw, hard_neg=hard_neg,
        hard_neg_ratio=hard_neg_ratio,
        want_smooth=bool(smooth_w) or smooth_on is True)

    loss_net = (pos_w * pos_loss + prob_w * prob_loss
                + surf_norm_w * jnp.asarray(surf_norm_on, jnp.float32) * surf_norm_loss
                + smooth_w * jnp.asarray(smooth_on, jnp.float32) * smooth_loss)

    # metrics (pipeline.py:549-566)
    pr_slot, _ = masked_argmax(outputs["prob_softmax"], pair_valid)
    acc = masked_mean((pr_slot == gt_slot).astype(jnp.float32), slot)
    nz = (jnp.sum(jnp.abs(gt_pos), -1) != 0) & slot
    l2 = jnp.sqrt(jnp.sum((pred_pos - gt_pos) ** 2, -1))
    err = masked_mean(l2, nz)

    return {
        "pos_loss": pos_loss,
        "prob_loss": prob_loss,
        "surf_norm_loss": surf_norm_loss,
        "smooth_loss": smooth_loss,
        "loss_net": loss_net,
        "acc": acc,
        "err": err,
        "angle_err": angle_err,
    }

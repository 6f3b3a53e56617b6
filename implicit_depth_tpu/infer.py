"""Serving API: one-call depth completion for RGB-D frames.

The reference's end-user inference path is ``exp_type: test`` through the
trainer (src/trainers/train_refine.py:625-664, src/models/pipeline.py:130-133
``mask_type='all'``): load the stage-1/stage-2 checkpoints, run the two-stage
forward on each frame, and write the completed depth. This module packages
that workflow as a library call::

    from implicit_depth_tpu.infer import DepthCompleter

    dc = DepthCompleter.from_checkpoint(
        "logs/run_lidf/ckpt", refine_ckpt_dir="logs/run_refine/ckpt")
    out = dc.complete(rgb_u8, depth_m, (fx, fy, cx, cy))
    out["depth"]       # completed depth at the input resolution (H0, W0)
    out["depth_pred"]  # raw predicted depth at every missing pixel

TPU-first serving notes: one jitted program per (batch) shape, compiled once
and cached (the persistent XLA cache makes repeat processes free); frames at
other resolutions are resized host-side to the configured model resolution
(the reference's datasets do the same resize, cv2, 320x240) with intrinsics
rescaled, and the completed depth is resized back nearest-neighbor (the
ClearGrasp eval protocol's resize mode, pipeline.py:578-584). Only the
composed (B, H, W) depth images cross the device->host boundary.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.builder import build_lidf, build_refine, build_static
from implicit_depth_tpu.config import Config, load_config
from implicit_depth_tpu.data.augmentation import standardize_image
from implicit_depth_tpu.models.lidf import prepare_inputs

Intrinsics = Union[Tuple[float, float, float, float], Sequence[float]]


class DepthCompleter:
    """Two-stage (LIDF + optional RefineNet) depth completion as a service.

    Build with :meth:`from_checkpoint` (trained weights) or directly from
    variable pytrees (e.g. a freshly imported reference checkpoint via
    scripts/import_torch_ckpt.py). ``batch_size`` fixes the compiled batch
    shape; :meth:`complete` pads shorter batches to it.
    """

    def __init__(self, cfg: Optional[Config] = None, *,
                 lidf_variables, refine_params=None, batch_size: int = 1,
                 mesh: Union[None, str, "jax.sharding.Mesh"] = None):
        """``mesh``: multi-chip serving. Pass a ("data", "rays")
        ``jax.sharding.Mesh`` or ``"auto"`` (builds one over all local
        devices, batch on ``data``, remaining chips splitting the per-pixel
        rays — the trainer's eval layout, train/steps.py). Variables are
        replicated once; GSPMD partitions the forward, so a single frame
        still uses every chip."""
        self.cfg = cfg if cfg is not None else load_config(
            overrides={"mask_type": "all"})
        self.h = int(self.cfg.dataset.img_height)
        self.w = int(self.cfg.dataset.img_width)
        self.batch_size = int(batch_size)
        # eval static: every pixel is a ray slot (mask_type='all',
        # pipeline.py:130-133) — same shapes the trainer evals/tests with
        self.static = build_static(self.cfg, n_rays=self.h * self.w)
        self.lidf = build_lidf(self.cfg, self.static)
        self.refine = build_refine(self.cfg, self.static) \
            if refine_params is not None else None
        if self.refine is not None and jax.default_backend() == "tpu":
            # serving is forward-only, so the no-VJP Pallas segmented-max
            # voxel pool is safe here and measured faster (two-stage 18.7
            # vs 19.2 ms, BASELINE.md round-5); training paths keep the
            # XLA scatter
            import dataclasses
            self.refine = dataclasses.replace(self.refine,
                                              use_pallas_segmax=True)
        if mesh == "auto":
            import math

            from implicit_depth_tpu.parallel.mesh import make_mesh
            n_dev = len(jax.devices())
            n_data = math.gcd(self.batch_size, n_dev)
            mesh = make_mesh((n_data, n_dev // n_data), ("data", "rays"))
        self.mesh = mesh
        if mesh is not None and lidf_variables is not None:
            from implicit_depth_tpu.parallel.mesh import replicate
            lidf_variables = replicate(lidf_variables, mesh)
            if refine_params is not None:
                refine_params = replicate(refine_params, mesh)
        self.lidf_variables = lidf_variables
        self.refine_params = refine_params
        self._forward = self._build_forward()

    # -- model forward ------------------------------------------------------
    def _build_forward(self):
        """Jitted end-to-end program for ONE packed feed spec: on-device
        unpack (u8 buffer -> batch dict, xyz back-projection) + two-stage
        forward + compose. Keyed per spec (``_forward(spec)``) so the whole
        frame is ONE device dispatch — through this image's remote relay
        each extra dispatch costs ~25 ms RTT; the packed buffer rides in
        the execute request itself."""
        forward_times = int(self.cfg.refine.forward_times)
        use_all_pix = bool(self.cfg.refine.use_all_pix)

        mesh = self.mesh
        shard_rays = mesh is not None and "rays" in mesh.axis_names \
            and mesh.shape["rays"] > 1

        @functools.partial(jax.jit, static_argnames=("spec",))
        def forward(lidf_vars, refine_params, buf, key, spec):
            from implicit_depth_tpu.train.feed import unpack_for_spec
            batch = unpack_for_spec(spec)(buf)
            inputs = prepare_inputs(self.static, batch, key, train=False,
                                    mask_type="all")
            if shard_rays:
                from implicit_depth_tpu.train.steps import (
                    ray_sharding_constraints,
                )
                inputs = ray_sharding_constraints(inputs, "data", "rays", mesh)
            out = self.lidf.apply(lidf_vars, inputs, train=False,
                                  use_gt_label=False)
            pred = out["pred_pos"]
            if self.refine is not None:
                inject = None
                if not use_all_pix:
                    # inject only zero-input-depth pixels into the refine
                    # PointNet (≙ mask_type 'all' eval, steps.py/refine eval)
                    zero_flat = (batch["depth_corrupt"].reshape(
                        batch["depth_corrupt"].shape[0], -1) == 0)
                    inject = jnp.take_along_axis(zero_flat,
                                                 inputs["miss_idx"], axis=1)
                for _ in range(forward_times):
                    pred = self.refine.apply({"params": refine_params},
                                             inputs, out, pred, inject)
            # compose on device; ship only (B, H, W) images to the host.
            # eval rays are pixel-aligned (miss_idx == arange, prepare_inputs)
            pred_z = pred[..., 2].reshape(-1, self.h, self.w)
            depth_in = batch["depth_corrupt"]
            completed = jnp.where(depth_in == 0, pred_z, depth_in)
            return completed, pred_z

        return forward

    # -- host-side frame handling ------------------------------------------
    def _prep_frame(self, rgb: np.ndarray, depth: np.ndarray,
                    intr: Intrinsics):
        """Resize a frame to the model resolution and build the batch entry.
        Returns (sample dict, original (H0, W0))."""
        fx, fy, cx, cy = (float(v) for v in intr)
        h0, w0 = depth.shape[:2]
        if (h0, w0) != (self.h, self.w):
            import cv2
            rgb = cv2.resize(rgb, (self.w, self.h),
                             interpolation=cv2.INTER_LINEAR)
            depth = cv2.resize(depth, (self.w, self.h),
                               interpolation=cv2.INTER_NEAREST)
            fx *= self.w / w0
            cx *= self.w / w0
            fy *= self.h / h0
            cy *= self.h / h0
        if rgb.dtype == np.uint8:
            rgb = standardize_image(rgb)
        depth = depth.astype(np.float32)
        return {
            "rgb": rgb.astype(np.float32),
            "depth_corrupt": depth,
            # "depth" (GT) is all-zero at serving; the packed feed derives
            # xyz_corrupt = backproject(depth_corrupt) ON DEVICE and
            # xyz = backproject(0) = 0 — exactly the GT-placeholder zeros
            # the loss path (which never runs here) would have seen
            "depth": np.zeros((self.h, self.w), np.float32),
            "corrupt_mask": (depth == 0).astype(np.float32),
            "valid_mask": (depth != 0).astype(np.float32),
            "fx": np.float32(fx), "fy": np.float32(fy),
            "cx": np.float32(cx), "cy": np.float32(cy),
        }, (h0, w0)

    # -- public API ---------------------------------------------------------
    def complete(self, rgb: np.ndarray, depth: np.ndarray,
                 intrinsics: Intrinsics, seed: int = 0) -> Dict[str, np.ndarray]:
        """Complete one RGB-D frame.

        rgb: (H0, W0, 3) uint8 (standardized internally) or pre-standardized
        float32; depth: (H0, W0) float meters, 0 at missing pixels;
        intrinsics: (fx, fy, cx, cy) at the input resolution.

        Returns {"depth": completed (H0, W0) — input depth where present,
        prediction where missing; "depth_pred": the model's predicted depth
        at every pixel, model resolution (h, w)}.
        """
        out = self.complete_batch([rgb], [depth], [intrinsics], seed=seed)
        return {"depth": out["depth"][0], "depth_pred": out["depth_pred"][0]}

    def complete_batch(self, rgbs, depths, intrinsics,
                       seed: int = 0) -> Dict[str, np.ndarray]:
        """Batched :meth:`complete`; inputs are sequences of equal length
        <= ``batch_size`` (shorter batches are padded to the compiled shape).
        ``depth`` entries in the result are at each frame's input resolution;
        ``depth_pred`` at the model resolution."""
        n = len(rgbs)
        if not (0 < n <= self.batch_size):
            raise ValueError(f"batch of {n} frames exceeds the compiled "
                             f"batch_size={self.batch_size}")
        samples, orig_hw = [], []
        for rgb, depth, intr in zip(rgbs, depths, intrinsics):
            s, hw = self._prep_frame(np.asarray(rgb), np.asarray(depth), intr)
            samples.append(s)
            orig_hw.append(hw)
        while len(samples) < self.batch_size:  # pad to the compiled shape
            samples.append(samples[-1])
        # packed single-transfer feed (train/feed.py): the whole batch as
        # ONE u8 buffer (f16 rgb/masks, u16 depths, xyz derived on device),
        # unpacked INSIDE the forward jit — a single device dispatch per
        # frame instead of ~8 puts + 2 dispatches (serve_frame_ms
        # 210 -> 113 -> see BASELINE.md round-5 serving record)
        from implicit_depth_tpu.parallel.mesh import put_global
        from implicit_depth_tpu.train.feed import fuse_bytes, pack_batch
        from jax.sharding import PartitionSpec as P

        batch_np = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        f32, f16, u16, spec = pack_batch(batch_np, derive_xyz=True)
        buf = fuse_bytes(f32, f16, u16)
        if self.mesh is not None:
            buf = put_global(buf, self.mesh, P("data"))
        else:
            # explicit idle-chip put before the dispatch: interleaved A/B'd
            # vs shipping the buffer inside the execute request — a wash on
            # latency (74-80 ms both, BASELINE.md round-5 serving record) —
            # but the explicit put keeps the transfer OFF the execute path,
            # avoiding the queued-put serialization pathology when frames
            # are pipelined (CLAUDE.md relay-feed gotcha)
            buf = jax.device_put(buf)
        completed, pred_z = self._forward(
            self.lidf_variables, self.refine_params, buf,
            jax.random.key(seed), spec)
        # ONE device_get for both outputs: separate np.asarray calls are a
        # device round-trip each (~25 ms through this image's relay)
        completed, pred_z = jax.device_get((completed, pred_z))
        completed = completed[:n]
        pred_z = pred_z[:n]
        out_depth = []
        for img, (h0, w0), depth0 in zip(completed, orig_hw, depths):
            if (h0, w0) != (self.h, self.w):
                import cv2
                img = cv2.resize(img, (w0, h0),
                                 interpolation=cv2.INTER_NEAREST)
            # exact input passthrough where depth was present: the device
            # copy is u16-quantized by the packed feed (~0.03 mm) and the
            # resize round-trips — the serving contract ("input depth where
            # present") is enforced bitwise against the ORIGINAL frame
            depth0 = np.asarray(depth0, np.float32)
            img = np.where(depth0 == 0, img, depth0)
            out_depth.append(img)
        return {"depth": np.stack(out_depth) if len(set(orig_hw)) == 1
                else out_depth,
                "depth_pred": pred_z}

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, lidf_ckpt_dir: str,
                        refine_ckpt_dir: Optional[str] = None,
                        cfg: Optional[Config] = None,
                        ckpt_name: str = "best_network",
                        batch_size: int = 1, mesh=None) -> "DepthCompleter":
        """Load trained weights from orbax checkpoint dirs (the trainer's
        ``<workdir>/ckpt`` layout; ``ckpt_name`` falls back to
        ``latest_network`` when the named snapshot is absent — ≙ the
        reference's explicit-path loading, train_refine.py:60-69)."""
        import os.path as osp

        from implicit_depth_tpu.train.checkpoint import restore_params_only

        cfg = cfg if cfg is not None else load_config(
            overrides={"mask_type": "all"})
        pick = lambda d: (ckpt_name if osp.isdir(osp.join(d, ckpt_name))
                          else "latest_network")

        # templates via model init on a dummy frame (shapes only)
        tmp = cls(cfg, lidf_variables=None, refine_params=None,
                  batch_size=batch_size)
        dummy = {
            "rgb": np.zeros((batch_size, tmp.h, tmp.w, 3), np.float32),
            "depth_corrupt": np.ones((batch_size, tmp.h, tmp.w), np.float32),
            "xyz": np.zeros((batch_size, tmp.h, tmp.w, 3), np.float32),
            "xyz_corrupt": np.zeros((batch_size, tmp.h, tmp.w, 3), np.float32),
            "corrupt_mask": np.zeros((batch_size, tmp.h, tmp.w), np.float32),
            "valid_mask": np.ones((batch_size, tmp.h, tmp.w), np.float32),
            "fx": np.full((batch_size,), 300.0, np.float32),
            "fy": np.full((batch_size,), 300.0, np.float32),
            "cx": np.full((batch_size,), tmp.w / 2, np.float32),
            "cy": np.full((batch_size,), tmp.h / 2, np.float32),
        }
        batch = {k: jnp.asarray(v) for k, v in dummy.items()}
        inputs = jax.jit(functools.partial(
            prepare_inputs, tmp.static, train=False, mask_type="all"))(
                batch, jax.random.key(0))
        lidf_vars = jax.jit(lambda k, i: tmp.lidf.init(
            k, i, train=False, use_gt_label=False))(jax.random.key(1), inputs)
        params, bstats = restore_params_only(lidf_ckpt_dir, lidf_vars,
                                             name=pick(lidf_ckpt_dir))
        lidf_vars = {"params": params, "batch_stats": bstats}

        refine_params = None
        if refine_ckpt_dir is not None:
            refine = build_refine(cfg, tmp.static)
            lidf_out = jax.jit(lambda v, i: tmp.lidf.apply(
                v, i, train=False, use_gt_label=False))(lidf_vars, inputs)
            rvars = jax.jit(lambda k, i, o: refine.init(
                k, i, o, o["pred_pos"]))(jax.random.key(2), inputs, lidf_out)
            refine_params, _ = restore_params_only(
                refine_ckpt_dir, rvars, name=pick(refine_ckpt_dir))

        return cls(cfg, lidf_variables=lidf_vars,
                   refine_params=refine_params, batch_size=batch_size,
                   mesh=mesh)

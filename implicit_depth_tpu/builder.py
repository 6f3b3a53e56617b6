"""Config -> model/static builders (the capability surface of the 6
reference experiment YAMLs, SURVEY.md §2.3)."""

from __future__ import annotations

import jax.numpy as jnp

from implicit_depth_tpu.config import Config
from implicit_depth_tpu.geometry.voxel import make_voxel_grid
from implicit_depth_tpu.models.lidf import LIDFModel, LIDFStatic
from implicit_depth_tpu.models.refine import RefineModel

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_static(cfg: Config, n_rays: int | None = None,
                 n_valid: int | None = None) -> LIDFStatic:
    grid = make_voxel_grid(cfg.grid.res)
    nv = n_valid if n_valid is not None else cfg.grid.valid_sample_num
    use_all_valid = nv == -1  # ≙ reference pipeline.py:137-140 (all valid pts)
    if use_all_valid:
        nv = cfg.dataset.img_height * cfg.dataset.img_width
    return LIDFStatic(
        grid=grid,
        n_valid=nv,
        n_rays=n_rays or cfg.grid.miss_sample_num,
        k_pairs=cfg.tpu.max_pairs_per_ray,
        roi_inp_bbox=cfg.model.roi_inp_bbox,
        roi_out_bbox=cfg.model.roi_out_bbox,
        use_all_valid=use_all_valid,
    )


def compute_dtype(cfg: Config):
    return _DTYPES[cfg.tpu.compute_dtype]


def _resolve_pallas(flag) -> bool:
    """'auto' => fused ray-decode kernel on the TPU backend only (off-TPU the
    kernel runs in interpret mode — correct but test-only slow)."""
    if flag == "auto":
        import jax
        return jax.default_backend() == "tpu"
    return bool(flag)


def build_lidf(cfg: Config, static: LIDFStatic) -> LIDFModel:
    m = cfg.model
    return LIDFModel(
        static=static,
        rgb_out=m.rgb_out,
        pnet_out=m.pnet_out,
        pnet_gf=m.pnet_gf,
        imnet_gf=m.imnet_gf,
        multires=m.multires,
        multires_views=m.multires_views,
        pos_encode=m.pos_encode,
        intersect_pos_type=m.intersect_pos_type,
        offdec_type=m.offdec_type,
        n_iter=m.n_iter,
        use_sigmoid=m.use_sigmoid,
        resnet_stages=tuple(m.get("resnet_stages", (3, 4, 6, 3))),
        offset_range=tuple(cfg.grid.offset_range),
        pairs_budget=cfg.tpu.get("pairs_budget_per_ray", 0),
        pairs_budget_mode=cfg.tpu.get("pairs_budget_mode", "per_ray"),
        use_pallas_decode=_resolve_pallas(cfg.tpu.get("use_pallas_decode",
                                                      "auto")),
        decode_rays_per_tile=cfg.tpu.get("decode_rays_per_tile", 64),
        decode_train_rays_per_tile=cfg.tpu.get("decode_train_rays_per_tile",
                                               192),
        decode_bwd=cfg.tpu.get("decode_bwd", "xla"),
        decode_serve_table=bool(cfg.tpu.get("decode_serve_table", False)),
        remat_backbone=cfg.tpu.get("remat_backbone", False),
        use_pallas_segmax=bool(cfg.tpu.get("use_pallas_segmax", False)),
        dtype=compute_dtype(cfg),
    )


def build_refine(cfg: Config, static: LIDFStatic) -> RefineModel:
    r = cfg.refine
    return RefineModel(
        static=static,
        pnet_out=r.pnet_out,
        pnet_gf=r.pnet_gf,
        imnet_gf=r.imnet_gf,
        multires=r.multires,
        multires_views=r.multires_views,
        pos_encode=r.pos_encode,
        intersect_pos_type=r.intersect_pos_type,
        pnet_pos_type=r.pnet_pos_type,
        offdec_type=r.offdec_type,
        n_iter=r.n_iter,
        use_sigmoid=r.use_sigmoid,
        offset_range=tuple(r.offset_range),
        use_pallas_decode=_resolve_pallas(cfg.tpu.get("use_pallas_decode",
                                                      "auto")),
        decode_rows_per_tile=cfg.tpu.get("refine_decode_rows_per_tile", 2000),
        use_pallas_segmax=bool(cfg.tpu.get("use_pallas_segmax", False)),
        dtype=compute_dtype(cfg),
    )

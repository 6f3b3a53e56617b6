"""Numpy port of the reference ``RefineNet.get_pred_refine`` — a TEST ORACLE.

Independent, dynamic-shape reimplementation of one stage-2 refinement
iteration (/root/reference/src/models/pipeline.py:922-1030): end-voxel
re-localization, predicted-point injection into the PointNet input, the
334-d [vox | roi | pos | dir] embedding, and the IEF offset decode with
``offset_range`` scaling. Used by tests/test_parity_pipeline.py to check the
COMPOSED stage-2 forward of implicit_depth_tpu (models/refine.py) with
shared weights, chained over ``forward_times`` iterations.

Two deliberate divergences from the reference (documented in
models/refine.py and docs/PARITY.md) are handled explicitly:

  * end-voxel rule: the reference merges via
    ``scatter(reduce='max')`` over occupied-voxel LIST INDICES
    (pipeline.py:939-944) — an artifact of its compressed voxel list that
    keeps the stage-1 voxel whenever the containing voxel happens to come
    earlier in the list. This oracle implements our documented containment
    rule (floor cell if occupied, else the stage-1 argmax voxel) and ALSO
    computes the reference's index-max rule, returning the per-ray
    agreement mask so the test can bound how often the two differ;
  * per-ray ROI RGB features are taken from stage 1 rather than re-pooled —
    the reference re-runs roi_align on the identical boxes
    (pipeline.py:952-967), so the values are equal by construction (ROI
    parity itself is covered by tests/test_roi_align.py). They are passed
    in already flattened in OUR spatial-major order, and the caller
    transplants the refine decoder layer-1 weights without the
    channel-major row permutation accordingly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from oracle_lidf import XMAX, XMIN, ief_forward, pointnet_forward, posenc


def refine_iteration_oracle(
        stage1: Dict[str, np.ndarray],
        roi_feat: np.ndarray,
        miss_rgb: np.ndarray,
        weights: Dict[str, Dict[str, np.ndarray]],
        pred_pos: np.ndarray,
        fallback_row: np.ndarray,
        *,
        inject_mask: np.ndarray | None = None,
        res: int = 8,
        multires: int = 8,
        multires_views: int = 4,
        n_iter: int = 2,
        offset_range=(-0.2, 0.2)) -> Tuple[np.ndarray, np.ndarray]:
    """One refinement iteration (pipeline.py:922-1030).

    stage1: the ``lidf_forward_oracle`` output dict (occ voxel list, valid
    point rows, ray geometry). roi_feat: (R, C_roi) per-ray RGB features in
    our flatten order. miss_rgb: (R, 3). pred_pos: (R, 3) current
    prediction. fallback_row: (R,) occupied-voxel LIST row of the stage-1
    argmax voxel per ray. weights: {'pnet': ..., 'offset_dec': ...} in torch
    state-dict layout. inject_mask: (R,) bool — rays whose predicted points
    feed the PointNet input (our model excludes rays with no stage-1 pair;
    the reference injects their dummy zero-points — a documented
    divergence). Masked-out rays still get decoded outputs but they are not
    meaningful.

    Returns (pred_pos_refine (R, 3), ref_rule_agrees (R,) bool) where the
    second output marks rays for which the reference's index-max end-voxel
    rule picks the same voxel as our containment rule.
    """
    occ_bid = stage1["occ_bid"]
    occ_coord = stage1["occ_coord"]
    part_size = stage1["part_size"]
    ray_dir = stage1["ray_dir"]
    mbid = stage1["mbid"]
    n_ray = len(mbid)

    xmin = np.asarray(XMIN, np.float32) - 0.5 * part_size
    dims = np.ceil((np.asarray(XMAX, np.float32) + 0.5 * part_size
                    - xmin) / part_size).astype(int)

    # ---- end-voxel re-localization ------------------------------------
    # ours (documented containment rule): floor cell if occupied, else the
    # stage-1 argmax voxel
    cell = np.floor((pred_pos - xmin) / part_size).astype(np.int64)
    inb = np.all((cell >= 0) & (cell < dims), axis=-1)
    row_of = {(int(b), int(ix), int(iy), int(iz)): r
              for r, (b, (ix, iy, iz)) in enumerate(zip(occ_bid, occ_coord))}
    cand = np.array([row_of.get((int(b), int(ix), int(iy), int(iz)), -1)
                     for b, (ix, iy, iz) in zip(mbid, cell)], np.int64)
    contained = inb & (cand >= 0)
    end_row = np.where(contained, cand, fallback_row)

    # reference rule (pcl_aabb inclusive bounds + scatter index-max,
    # pipeline.py:939-944) — for the agreement report only
    bound_min = xmin + occ_coord * part_size
    bound_max = bound_min + part_size
    inside = np.all((pred_pos[:, None, :] >= bound_min[None])
                    & (pred_pos[:, None, :] <= bound_max[None]), -1)
    inside &= mbid[:, None] == occ_bid[None, :]
    ref_row = fallback_row.copy()
    ri, vi = np.nonzero(inside)
    np.maximum.at(ref_row, ri, vi)
    agree = ref_row == end_row

    # ---- PointNet with injected predictions (pipeline.py:999-1016) ----
    end_center = xmin + occ_coord[end_row] * part_size + 0.5 * part_size
    pred_inp = np.concatenate([pred_pos - end_center, miss_rgb], -1)
    valid_inp = np.concatenate([stage1["v_rel_coord"],
                                stage1["valid_rgb_keep"]], -1)
    if inject_mask is None:
        inject_mask = np.ones(n_ray, bool)
    final_inp = np.concatenate([valid_inp, pred_inp[inject_mask]],
                               0).astype(np.float32)
    final_rev = np.concatenate([stage1["revidx"], end_row[inject_mask]], 0)
    vox_feat = pointnet_forward(weights["pnet"], final_inp, final_rev,
                                len(occ_bid))
    end_feat = vox_feat[end_row]

    # ---- embedding + decode (pipeline.py:1018-1029) -------------------
    pos_e = posenc(pred_pos, multires)          # intersect_pos_type='abs'
    dir_e = posenc(ray_dir, multires_views)
    embed = np.concatenate([end_feat, roi_feat, pos_e, dir_e],
                           -1).astype(np.float32)
    off = ief_forward(weights["offset_dec"], embed, n_iter)[:, 0]
    scaled = off * (offset_range[1] - offset_range[0]) + offset_range[0]
    return (pred_pos + scaled[:, None] * ray_dir).astype(np.float32), agree

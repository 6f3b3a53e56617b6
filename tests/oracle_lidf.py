"""Numpy port of the reference ``LIDF.forward`` stages 3-9 — a TEST ORACLE.

Independent, dynamic-shape reimplementation of
/root/reference/src/models/pipeline.py:162-711 (get_occ_vox_bound,
compute_ray_aabb, compute_gt, get_embedding, get_pred, compute_loss) plus the
native kernels it calls (ray_aabb_cuda_kernel.cu slab test, pcl_aabb point-in
-box, torch_scatter softmax/log_softmax/max, torchvision roi_align) — written
from the reference's SEMANTICS in plain numpy, following its variable-length
list-based dataflow rather than our static (B,R,K) tensors. Used by
tests/test_parity_pipeline.py to check the COMPOSED pipeline (embedding concat
order, √3·part_size offset scaling, per-ray softmax/argmax semantics, loss
reductions) against implicit_depth_tpu's jitted forward with shared weights.

Weights come in REFERENCE layout: torch-style (out,in) linear matrices and the
channel-major ROI flatten (pipeline.py:384-389).

Inputs the oracle does NOT re-derive (supplied by the caller so both sides see
identical data): the sampled valid/miss index lists (stage 2/4 sampling is
RNG; sampling parity is covered by tests/test_geometry.py) and the ResNet
feature map (module parity is covered by tests/test_parity_torch.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

XMIN = (-1.0, -1.0, 0.0)
XMAX = (1.0, 1.0, 2.0)


# ---------------------------------------------------------------------------
# small numeric pieces
# ---------------------------------------------------------------------------

def posenc(x: np.ndarray, multires: int) -> np.ndarray:
    """NeRF encoding, reference layout (implicit_net.py:9-57):
    [x | sin(2^0 x) | cos(2^0 x) | ... | sin(2^(m-1) x) | cos(2^(m-1) x)]."""
    parts = [x]
    for j in range(multires):
        f = 2.0 ** j
        parts.append(np.sin(x * f))
        parts.append(np.cos(x * f))
    return np.concatenate(parts, axis=-1).astype(np.float32)


def leaky(x):
    return np.where(x > 0, x, 0.02 * x)


def soft_clamp(x):
    return np.maximum(np.minimum(x, 0.01 * x + 0.99), 0.01 * x)


def imnet_forward(w: Dict[str, np.ndarray], x: np.ndarray) -> np.ndarray:
    """IMNet (implicit_net.py:60-98); w holds linear_{1..4}.{weight,bias}."""
    h = x
    for i in (1, 2, 3):
        h = leaky(h @ w[f"linear_{i}.weight"].T + w[f"linear_{i}.bias"])
    out = h @ w["linear_4.weight"].T + w["linear_4.bias"]
    return soft_clamp(out)


def ief_forward(w: Dict[str, np.ndarray], x: np.ndarray,
                n_iter: int = 2, init_offset: float = 0.001) -> np.ndarray:
    """IEF (implicit_net.py:100-152)."""
    offset = np.full((x.shape[0], 1), init_offset, np.float32)
    for _ in range(n_iter):
        feat = offset @ w["offset_enc.weight"].T + w["offset_enc.bias"]
        h = np.concatenate([x, feat], axis=-1)
        for i in (1, 2, 3):
            h = leaky(h @ w[f"linear_{i}.weight"].T + w[f"linear_{i}.bias"])
        offset = offset + h @ w["linear_4.weight"].T + w["linear_4.bias"]
    return soft_clamp(offset)


def pointnet_forward(w: Dict[str, np.ndarray], inp: np.ndarray,
                     revidx: np.ndarray, n_vox: int) -> np.ndarray:
    """PointNet2Stage (pointnet.py:7-38) with torch_scatter max semantics
    (empty segments -> 0 on these post-ReLU features)."""
    lin = lambda name, x: x @ w[name + ".weight"].T + w[name + ".bias"]

    def seg_max(feat):
        out = np.zeros((n_vox, feat.shape[1]), np.float32)
        np.maximum.at(out, revidx, feat)
        return out

    p1 = np.maximum(lin("point_lin1", inp), 0)
    p2 = np.maximum(lin("point_lin2", p1), 0)
    v1 = np.maximum(lin("vox_lin1", seg_max(p2)), 0)
    p3 = np.concatenate([v1[revidx], p2], axis=-1)
    p4 = np.maximum(lin("point_lin3", p3), 0)
    p5 = np.maximum(lin("point_lin4", p4), 0)
    return np.maximum(lin("vox_lin2", seg_max(p5)), 0)


def scatter_softmax(logits: np.ndarray, seg: np.ndarray, n_seg: int):
    """torch_scatter.scatter_softmax over ragged segments."""
    mx = np.full(n_seg, -np.inf, np.float32)
    np.maximum.at(mx, seg, logits)
    e = np.exp(logits - mx[seg])
    den = np.zeros(n_seg, np.float32)
    np.add.at(den, seg, e)
    return e / den[seg]


def scatter_log_softmax(logits: np.ndarray, seg: np.ndarray, n_seg: int):
    mx = np.full(n_seg, -np.inf, np.float32)
    np.maximum.at(mx, seg, logits)
    e = np.exp(logits - mx[seg])
    den = np.zeros(n_seg, np.float32)
    np.add.at(den, seg, e)
    return (logits - mx[seg]) - np.log(den[seg])


def scatter_max_arg(vals: np.ndarray, seg: np.ndarray, n_seg: int):
    """torch_scatter.scatter_max: per-segment (max, argmax); empty segments
    get argmax == len(vals) (the reference's dummy-row sentinel,
    pipeline.py:452-454)."""
    arg = np.full(n_seg, len(vals), np.int64)
    best = np.full(n_seg, -np.inf, np.float32)
    for i, (v, s) in enumerate(zip(vals, seg)):
        if v > best[s]:
            best[s] = v
            arg[s] = i
    return best, arg


def roi_align_cm(feat_map: np.ndarray, bid: np.ndarray, px: np.ndarray,
                 py: np.ndarray, inp_bbox: int = 8, out_bbox: int = 2):
    """torchvision roi_align (aligned=True, spatial_scale=1, adaptive
    sampling) on pixel-centered boxes, flattened CHANNEL-major as the
    reference does (pipeline.py:372-389). feat_map: (B, H, W, C)."""
    b, h, w, c = feat_map.shape
    n = len(bid)
    half = inp_bbox // 2
    x1 = np.clip(px - half, 0, w - 1).astype(np.float32)
    y1 = np.clip(py - half, 0, h - 1).astype(np.float32)
    x2 = np.clip(px + half, 0, w - 1).astype(np.float32)
    y2 = np.clip(py + half, 0, h - 1).astype(np.float32)
    out = np.zeros((n, c, out_bbox, out_bbox), np.float32)
    for i in range(n):
        fx1, fy1 = x1[i] - 0.5, y1[i] - 0.5   # aligned=True offset
        roi_w, roi_h = x2[i] - x1[i], y2[i] - y1[i]
        bw, bh = roi_w / out_bbox, roi_h / out_bbox
        gw = max(int(np.ceil(bw)), 1)
        gh = max(int(np.ceil(bh)), 1)
        fm = feat_map[bid[i]]
        for oy in range(out_bbox):
            for ox in range(out_bbox):
                acc = np.zeros(c, np.float32)
                for sy in range(gh):
                    for sx in range(gw):
                        y = fy1 + oy * bh + (sy + 0.5) * bh / gh
                        x = fx1 + ox * bw + (sx + 0.5) * bw / gw
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        yy = min(max(y, 0.0), h - 1)
                        xx = min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
                        y1b, x1b = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = yy - y0, xx - x0
                        acc += ((1 - ly) * (1 - lx) * fm[y0, x0]
                                + (1 - ly) * lx * fm[y0, x1b]
                                + ly * (1 - lx) * fm[y1b, x0]
                                + ly * lx * fm[y1b, x1b])
                out[i, :, oy, ox] = acc / (gh * gw)
    return out.reshape(n, -1)  # channel-major flatten


def surface_normal(pcl_img: np.ndarray):
    """point_utils.get_surface_normal (:210-235): tf.image_gradients-style
    dx/dy, cross product, L2-normalize. pcl_img: (H, W, 3)."""
    dy = np.zeros_like(pcl_img)
    dx = np.zeros_like(pcl_img)
    dy[:-1] = pcl_img[1:] - pcl_img[:-1]
    dx[:, :-1] = pcl_img[:, 1:] - pcl_img[:, :-1]
    n = np.cross(dx, dy)
    norm = np.sqrt((n * n).sum(-1, keepdims=True))
    return n / (norm + 1e-8), dx, dy


# ---------------------------------------------------------------------------
# the composed forward
# ---------------------------------------------------------------------------

def lidf_forward_oracle(batch: Dict[str, np.ndarray],
                        valid_idx: np.ndarray,
                        miss_idx: np.ndarray,
                        feat_map: np.ndarray,
                        weights: Dict[str, Dict[str, np.ndarray]],
                        *,
                        res: int = 8,
                        multires: int = 8,
                        multires_views: int = 4,
                        n_iter: int = 2,
                        offset_range=(0.0, 1.0),
                        use_gt_label: bool = False,
                        train: bool = True,
                        pos_w: float = 100.0,
                        prob_w: float = 0.5,
                        surf_norm_w: float = 10.0) -> Dict[str, np.ndarray]:
    """Stages 3-9 of LIDF.forward (pipeline.py:652-711).

    valid_idx/miss_idx: (N, 2) arrays of [batch_id, flat_img_id].
    weights: {'pnet': {...}, 'offset_dec': {...}, 'prob_dec': {...}} in
    torch state-dict layout.
    Returns per-ray and scalar outputs keyed like the reference data_dict.
    """
    b, h, w, _ = batch["rgb"].shape
    xyz_flat = batch["xyz"].reshape(b, h * w, 3)
    xyz_corrupt_flat = batch["xyz_corrupt"].reshape(b, h * w, 3)

    # grid setup (pipeline.py:165-173)
    xmin = np.asarray(XMIN, np.float32)
    xmax = np.asarray(XMAX, np.float32)
    part_size = float(np.min(xmax - xmin)) / res
    xmin = xmin - 0.5 * part_size
    xmax = xmax + 0.5 * part_size
    rr = np.ceil((xmax - xmin) / part_size).astype(int)  # 9,9,9

    # stage 3: occupied voxels (point_utils.py:12-76)
    vbid = valid_idx[:, 0]
    vfid = valid_idx[:, 1]
    valid_xyz = xyz_corrupt_flat[vbid, vfid]
    valid_rgb = batch["rgb"].reshape(b, h * w, 3)[vbid, vfid]
    rel_pts = valid_xyz - xmin
    coord = np.floor(rel_pts / part_size).astype(np.int64)
    inb = np.all((coord >= 0) & (coord < rr), axis=-1)
    keep = np.nonzero(inb)[0]                 # valid_v_pid
    rec = np.concatenate([vbid[keep, None], coord[keep]], axis=1)
    occ, revidx = np.unique(rec, axis=0, return_inverse=True)
    occ_bid = occ[:, 0]
    occ_coord = occ[:, 1:]
    center = xmin + occ_coord * part_size + 0.5 * part_size
    bound_min = xmin + occ_coord * part_size
    bound_max = bound_min + part_size
    voxel_bound = np.concatenate([bound_min, bound_max], axis=1).astype(np.float32)
    v_rel_coord = (valid_xyz[keep]
                   - (xmin + coord[keep] * part_size + 0.5 * part_size))

    # stage 4: miss rays (pipeline.py:203-269); dirs from the pinhole model
    mbid = miss_idx[:, 0]
    mfid = miss_idx[:, 1]
    px = (mfid % w).astype(np.float32)
    py = (mfid // w).astype(np.float32)
    fx = batch["fx"][mbid]
    fy = batch["fy"][mbid]
    cx = batch["cx"][mbid]
    cy = batch["cy"][mbid]
    d = np.stack([px - cx, (py - cy) * fx / fy, fx], axis=-1)
    ray_dir = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    n_ray = len(mbid)

    # stage 5: ray/AABB slab test (ray_aabb_cuda_kernel.cu:10-89)
    invd = 1.0 / (ray_dir + 1e-12)                       # (R, 3)
    lo = np.where(invd[:, None, :] >= 0, voxel_bound[None, :, :3],
                  voxel_bound[None, :, 3:])               # (R, V, 3)
    hi = np.where(invd[:, None, :] >= 0, voxel_bound[None, :, 3:],
                  voxel_bound[None, :, :3])
    tmin = lo * invd[:, None, :]
    tmax = hi * invd[:, None, :]
    # the kernel's sequential pairwise merge (x∩y, then ∩z) passes exactly
    # when the full interval intersection is non-empty
    t_enter = tmin.max(-1)
    t_exit = tmax.min(-1)
    hit = (t_enter <= t_exit) & (mbid[:, None] == occ_bid[None, :])
    vox_i, ray_i = np.nonzero(hit.T)                      # reference nonzero
    # order: voxel-major (mask is (V, R)), matching pipeline.py:288-290

    # stage 6: GT labels (pipeline.py:298-336 + pcl_aabb kernel: inclusive)
    gt_pos = xyz_flat[mbid, mfid]
    inside = np.all((gt_pos[:, None, :] >= voxel_bound[None, :, :3])
                    & (gt_pos[:, None, :] <= voxel_bound[None, :, 3:]), -1)
    inside &= (mbid[:, None] == occ_bid[None, :])
    pcl_label = inside[ray_i, vox_i].astype(np.float32)

    # stage 7: embeddings (pipeline.py:338-425)
    enter_pos = ray_dir[ray_i] * t_enter.T[vox_i, ray_i][:, None]
    leave_pos = ray_dir[ray_i] * t_exit.T[vox_i, ray_i][:, None]
    enter_e = posenc(enter_pos, multires)
    leave_e = posenc(leave_pos, multires)
    dir_e = posenc(ray_dir[ray_i], multires_views)
    roi = roi_align_cm(feat_map, mbid[ray_i], px[ray_i].astype(np.int64),
                       py[ray_i].astype(np.int64))
    pnet_inp = np.concatenate([v_rel_coord, valid_rgb[keep]], -1).astype(np.float32)
    vox_feat = pointnet_forward(weights["pnet"], pnet_inp, revidx, len(occ))
    pair_vox = vox_feat[vox_i]

    # stage 8: decode (pipeline.py:427-466)
    embed = np.concatenate([pair_vox, roi, enter_e, leave_e, dir_e], -1)
    pred_offset = ief_forward(weights["offset_dec"], embed, n_iter)[:, 0]
    prob_logit = imnet_forward(weights["prob_dec"], embed)[:, 0]
    scaled = ((pred_offset * (offset_range[1] - offset_range[0])
               + offset_range[0]) * np.sqrt(3.0) * part_size)
    pair_pred_pos = enter_pos + scaled[:, None] * ray_dir[ray_i]
    prob_softmax = scatter_softmax(prob_logit, ray_i, n_ray)
    if use_gt_label:
        _, max_pair_id = scatter_max_arg(pcl_label, ray_i, n_ray)
    else:
        _, max_pair_id = scatter_max_arg(prob_softmax, ray_i, n_ray)
    pair_pred_dummy = np.concatenate([pair_pred_pos, np.zeros((1, 3))], 0)
    pred_pos = pair_pred_dummy[max_pair_id].astype(np.float32)

    # stage 9: losses (pipeline.py:468-546)
    pos_loss = np.abs(pred_pos - gt_pos).mean()
    log_sm = scatter_log_softmax(prob_logit, ray_i, n_ray)
    labeled = np.nonzero(pcl_label)[0]
    prob_loss = (-log_sm[labeled]).mean() if len(labeled) else 0.0

    base = xyz_flat if train else xyz_corrupt_flat
    gt_pcl = base.copy()
    gt_pcl[mbid, mfid] = gt_pos
    pr_pcl = base.copy()
    pr_pcl[mbid, mfid] = pred_pos
    sn_cos = np.zeros(n_ray, np.float32)
    dx2 = np.zeros(n_ray, np.float32)
    dy2 = np.zeros(n_ray, np.float32)
    for bi in range(b):
        gn, _, _ = surface_normal(gt_pcl[bi].reshape(h, w, 3))
        pn, dx, dy = surface_normal(pr_pcl[bi].reshape(h, w, 3))
        sel = mbid == bi
        fid = mfid[sel]
        gsel = gn.reshape(-1, 3)[fid]
        psel = pn.reshape(-1, 3)[fid]
        # F.cosine_similarity clamps each norm at eps=1e-8
        den = (np.maximum(np.linalg.norm(gsel, axis=-1), 1e-8)
               * np.maximum(np.linalg.norm(psel, axis=-1), 1e-8))
        sn_cos[sel] = (gsel * psel).sum(-1) / den
        dx2[sel] = (dx * dx).sum(-1).reshape(-1)[fid]
        dy2[sel] = (dy * dy).sum(-1).reshape(-1)[fid]
    surf_norm_loss = ((1.0 - sn_cos) / 2.0).mean()
    smooth_loss = dx2.mean() + dy2.mean()
    loss_net = pos_w * pos_loss + prob_w * prob_loss + surf_norm_w * surf_norm_loss

    return {
        "occ_coord": occ_coord, "occ_bid": occ_bid,
        "part_size": part_size,
        # stage-2 (refine) inputs: valid-point pnet rows + ray geometry
        "revidx": revidx, "v_rel_coord": v_rel_coord,
        "valid_rgb_keep": valid_rgb[keep],
        "ray_dir": ray_dir, "mbid": mbid, "mfid": mfid,
        "vox_i": vox_i, "ray_i": ray_i,
        "t_enter": t_enter.T[vox_i, ray_i], "t_exit": t_exit.T[vox_i, ray_i],
        "pcl_label": pcl_label,
        "prob_logit": prob_logit, "prob_softmax": prob_softmax,
        "pred_offset": pred_offset,
        "pair_pred_pos": pair_pred_pos,
        "max_pair_id": max_pair_id,
        "pred_pos": pred_pos, "gt_pos": gt_pos,
        "pos_loss": pos_loss, "prob_loss": prob_loss,
        "surf_norm_loss": surf_norm_loss, "smooth_loss": smooth_loss,
        "loss_net": loss_net,
    }

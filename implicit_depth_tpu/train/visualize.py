"""Visualization dumps.

Parity: TrainLIDF.visualize (src/trainers/train_lidf.py:486-581): a 3-panel
PNG (rgb / corrupt mask / valid mask), four PLY point clouds (input, GT,
prediction, prediction-in-transparent-region), and surface-normal images.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict

import cv2
import numpy as np

from implicit_depth_tpu.data.augmentation import unstandardize_image
from implicit_depth_tpu.utils.ply import save_point_cloud


def _normal_png(normal_img: np.ndarray) -> np.ndarray:
    return ((normal_img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


def dump_batch_visuals(out_dir: str, prefix: str, batch: Dict[str, np.ndarray],
                       inputs, pred_pos, index: int = 0) -> None:
    """Write PNG panels + PLY clouds for one image of a batch."""
    rgb = unstandardize_image(np.asarray(batch["rgb"][index]))
    corrupt = (np.asarray(batch["corrupt_mask"][index]) * 255).astype(np.uint8)
    valid = (np.asarray(batch["valid_mask"][index]) * 255).astype(np.uint8)
    h, w = corrupt.shape
    panel = np.concatenate([
        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
        cv2.cvtColor(corrupt, cv2.COLOR_GRAY2BGR),
        cv2.cvtColor(valid, cv2.COLOR_GRAY2BGR),
    ], axis=1)
    cv2.imwrite(osp.join(out_dir, f"{prefix}_panel.png"), panel)

    rgb01 = rgb.astype(np.float32) / 255.0
    xyz = np.asarray(batch["xyz"][index]).reshape(-1, 3)
    xyz_corrupt = np.asarray(batch["xyz_corrupt"][index]).reshape(-1, 3)
    colors = rgb01.reshape(-1, 3)

    inp_sel = xyz_corrupt[:, 2] > 0
    save_point_cloud(osp.join(out_dir, f"{prefix}_inp.ply"),
                     xyz_corrupt[inp_sel], colors[inp_sel])
    gt_sel = xyz[:, 2] > 0
    save_point_cloud(osp.join(out_dir, f"{prefix}_gt.ply"),
                     xyz[gt_sel], colors[gt_sel])

    midx = np.asarray(inputs["miss_idx"][index])
    slot = np.asarray(inputs["miss_slot"][index])
    pred = np.asarray(pred_pos[index])
    pred_cloud = xyz_corrupt.copy()
    pred_cloud[midx[slot]] = pred[slot]
    sel = pred_cloud[:, 2] > 0
    save_point_cloud(osp.join(out_dir, f"{prefix}_pred.ply"),
                     pred_cloud[sel], colors[sel])

    mask_flat = np.asarray(batch["corrupt_mask"][index]).reshape(-1) > 0.5
    trans_sel = np.zeros(h * w, bool)
    trans_sel[midx[slot]] = True
    trans_sel &= mask_flat
    save_point_cloud(osp.join(out_dir, f"{prefix}_pred_transparent.ply"),
                     pred_cloud[trans_sel], colors[trans_sel])

    # surface-normal images of GT and predicted clouds (train_lidf.py:486-581)
    for name, cloud in (("gt", xyz), ("pred", pred_cloud)):
        img = cloud.reshape(h, w, 3)
        dx = np.zeros_like(img)
        dy = np.zeros_like(img)
        dx[:, :-1] = img[:, 1:] - img[:, :-1]
        dy[:-1, :] = img[1:, :] - img[:-1, :]
        n = np.cross(dx, dy)
        n /= np.sqrt((n * n).sum(-1, keepdims=True) + 1e-12)
        cv2.imwrite(osp.join(out_dir, f"{prefix}_{name}_normal.png"),
                    _normal_png(n)[..., ::-1])

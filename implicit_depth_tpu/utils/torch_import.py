"""Reference-checkpoint importer: torch ``.pth`` state dicts -> our param trees.

The reference ships pretrained checkpoints (``best_network.pth``,
/root/reference/README.md:75) saved as one dict of per-submodule torch state
dicts — stage 1: ``resnet_model`` / ``pnet_model`` / ``offset_dec`` /
``prob_dec`` (src/trainers/train_lidf.py:349-371); stage 2:
``pnet_model_refine`` / ``offset_dec_refine`` (train_refine.py:356-368).
This module maps those names/layouts into the flax param + batch_stats trees
of ``LIDFModel`` / ``RefineModel`` so eval-parity against the paper's
checkpoints is a one-command conversion (scripts/import_torch_ckpt.py).

Layout facts encoded here (mirrors tests/test_parity_torch.py transplants):
  torch Linear weight (out,in)  -> flax Dense kernel (in,out)   [transpose]
  torch Conv2d weight (o,i,kh,kw) -> flax Conv kernel (kh,kw,i,o)
  BN: weight/bias -> scale/bias (params); running_mean/var -> mean/var (stats)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _np(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to numpy (accepts numpy already)."""
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert_resnet(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """``Resnet34_8s`` state dict (keys ``resnet34_8s.*``,
    src/models/resnet_dilated.py:283-323) -> (params, batch_stats) for our
    ``ResNet34_8s`` (models/resnet.py)."""
    sd = _np(sd)
    pre = "resnet34_8s."
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst_p, dst_s, key):
        dst_p["scale"] = sd[key + ".weight"]
        dst_p["bias"] = sd[key + ".bias"]
        dst_s["mean"] = sd[key + ".running_mean"]
        dst_s["var"] = sd[key + ".running_var"]

    params["conv1"] = {"kernel": _conv(sd[pre + "conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    bn(params["bn1"], stats["bn1"], pre + "bn1")

    # stage sizes are implied by the key set (ResNet34: 3,4,6,3)
    for stage in range(1, 5):
        i = 0
        while f"{pre}layer{stage}.{i}.conv1.weight" in sd:
            name = f"layer{stage}_{i}"
            blk = f"{pre}layer{stage}.{i}"
            p: Dict[str, Any] = {
                "conv1": {"kernel": _conv(sd[blk + ".conv1.weight"])},
                "conv2": {"kernel": _conv(sd[blk + ".conv2.weight"])},
                "bn1": {}, "bn2": {},
            }
            s: Dict[str, Any] = {"bn1": {}, "bn2": {}}
            bn(p["bn1"], s["bn1"], blk + ".bn1")
            bn(p["bn2"], s["bn2"], blk + ".bn2")
            if blk + ".downsample.0.weight" in sd:
                p["down_conv"] = {"kernel": _conv(sd[blk + ".downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = {}, {}
                bn(p["down_bn"], s["down_bn"], blk + ".downsample.1")
            params[name], stats[name] = p, s
            i += 1

    params["fc"] = {"kernel": _conv(sd[pre + "fc.weight"]),
                    "bias": sd[pre + "fc.bias"]}
    return params, stats


_PNET_ORDER = ("point_lin1", "point_lin2", "vox_lin1",
               "point_lin3", "point_lin4", "vox_lin2")


def convert_pointnet(sd: Dict[str, Any]) -> Dict:
    """``PointNet2Stage`` (src/models/pointnet.py:7-38) -> our compact-Dense
    tree; our Dense_0..Dense_5 call order matches the reference's layer
    order exactly (models/pointnet.py)."""
    sd = _np(sd)
    return {f"Dense_{i}": {"kernel": _t(sd[n + ".weight"]),
                           "bias": sd[n + ".bias"]}
            for i, n in enumerate(_PNET_ORDER)}


def roi_row_permutation(start: int, rgb_c: int, spatial: int) -> np.ndarray:
    """Input-row permutation between the two ROI-feature flatten orders.

    The reference flattens the ROIAlign output channel-major —
    ``(N, C, 2, 2).reshape(N, -1)`` (pipeline.py:384-389): index ``c*S + s``.
    Our pipeline flattens spatial-major — ``(N, 2, 2, C).reshape(N, -1)``
    (models/lidf.py roi reshape): index ``s*C + c``. A decoder's first-layer
    weight therefore needs its ROI input rows permuted when moving between
    frameworks: ``ours[start + s*C + c] = ref[start + c*S + s]``.

    Returns perm with ``our_kernel[i] = ref_kernel[perm[i]]`` for the full
    input dimension assumed to be ``start + rgb_c*spatial`` rows onward
    unchanged (callers apply to the block only).
    """
    s = np.arange(spatial)
    c = np.arange(rgb_c)
    # block_perm[s*C + c] = c*S + s
    block = (c[None, :] * spatial + s[:, None]).reshape(-1)
    return start + block


def _permute_l1(kernel: np.ndarray, roi_block) -> np.ndarray:
    """Apply the ROI row permutation to a layer-1 kernel (in,out)."""
    if roi_block is None:
        return kernel
    start, rgb_c, spatial = roi_block
    perm = roi_row_permutation(start, rgb_c, spatial)
    out = np.array(kernel)
    out[start:start + rgb_c * spatial] = kernel[perm]
    return out


def convert_imnet(sd: Dict[str, Any], roi_block=None) -> Dict:
    """``IMNet`` (implicit_net.py:60-98) -> {_MLP4_0: Dense_0..3}.

    ``roi_block=(start, rgb_c, spatial)`` permutes the layer-1 rows that
    consume the ROI feature between the reference's channel-major flatten and
    our spatial-major one (see ``roi_row_permutation``)."""
    sd = _np(sd)
    out = {"_MLP4_0": {f"Dense_{i}": {"kernel": _t(sd[f"linear_{i + 1}.weight"]),
                                      "bias": sd[f"linear_{i + 1}.bias"]}
                       for i in range(4)}}
    out["_MLP4_0"]["Dense_0"]["kernel"] = _permute_l1(
        out["_MLP4_0"]["Dense_0"]["kernel"], roi_block)
    return out


def convert_ief(sd: Dict[str, Any], roi_block=None) -> Dict:
    """``IEF`` (implicit_net.py:100-152) -> {Dense_0: offset_enc, _MLP4_0}."""
    sd = _np(sd)
    out = convert_imnet(sd, roi_block)
    out["Dense_0"] = {"kernel": _t(sd["offset_enc.weight"]),
                      "bias": sd["offset_enc.bias"]}
    return out


def _convert_offset_dec(sd: Dict[str, Any], roi_block=None) -> Dict:
    return convert_ief(sd, roi_block) if any(
        k.startswith("offset_enc") for k in sd) else convert_imnet(sd, roi_block)


def convert_lidf_checkpoint(ckpt: Dict[str, Any],
                            roi_spatial: int = 4) -> Tuple[Dict, Dict, Dict]:
    """Full stage-1 ckpt dict -> (params, batch_stats, meta scalars).

    The decoder embedding is [pnet | roi | enter | leave | dir]
    (pipeline.py:431-433); the roi block starts at pnet_out and holds
    rgb_out × roi_out_bbox² rows, which get the flatten-order permutation."""
    pnet_out = int(np.asarray(_np(ckpt["pnet_model"])["vox_lin2.weight"]).shape[0])
    rgb_out = int(np.asarray(_np(ckpt["resnet_model"])
                             ["resnet34_8s.fc.bias"]).shape[0])
    roi_block = (pnet_out, rgb_out, roi_spatial)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["resnet"], stats["resnet"] = convert_resnet(ckpt["resnet_model"])
    params["pnet"] = convert_pointnet(ckpt["pnet_model"])
    params["offset_dec"] = _convert_offset_dec(ckpt["offset_dec"], roi_block)
    params["prob_dec"] = convert_imnet(ckpt["prob_dec"], roi_block)
    meta = {k: float(v) for k, v in ckpt.items()
            if isinstance(v, (int, float)) and k != "epoch"}
    meta["epoch"] = int(ckpt.get("epoch", 0))
    return params, stats, meta


def convert_refine_checkpoint(ckpt: Dict[str, Any], rgb_out: int = 32,
                              roi_spatial: int = 4) -> Tuple[Dict, Dict, Dict]:
    """Stage-2 ckpt dict (train_refine.py:363-368) -> (params, {}, meta).

    Stage-2 embedding is [end_vox_feat | roi | pos | dir] (pipeline.py:
    1018-1025) — the roi block again starts at pnet_out. rgb_out cannot be
    inferred from a refine-only ckpt (no resnet inside), hence the arg."""
    pnet_out = int(np.asarray(
        _np(ckpt["pnet_model_refine"])["vox_lin2.weight"]).shape[0])
    roi_block = (pnet_out, rgb_out, roi_spatial)
    params = {"pnet": convert_pointnet(ckpt["pnet_model_refine"]),
              "offset_dec": _convert_offset_dec(ckpt["offset_dec_refine"],
                                                roi_block)}
    meta = {k: float(v) for k, v in ckpt.items()
            if isinstance(v, (int, float)) and k != "epoch"}
    meta["epoch"] = int(ckpt.get("epoch", 0))
    return params, {}, meta


def import_torch_checkpoint(pth_path: str, out_dir: str,
                            stage: str = "auto") -> str:
    """Convert a reference ``.pth`` into an orbax checkpoint directory that
    ``checkpoint_path`` / ``lidf_ckpt_path`` configs can load directly
    (train/checkpoint.py restore_params_only). Returns the stage imported."""
    import torch

    from implicit_depth_tpu.train.checkpoint import Checkpointer

    ckpt = torch.load(pth_path, map_location="cpu")
    if stage == "auto":
        stage = "refine" if "pnet_model_refine" in ckpt else "lidf"
    convert = (convert_refine_checkpoint if stage == "refine"
               else convert_lidf_checkpoint)
    params, stats, meta = convert(ckpt)
    state = {"step": 0, "params": params, "batch_stats": stats, "opt_state": {}}
    Checkpointer(out_dir).save(state, epoch=meta.get("epoch", 0), meta=meta)
    return stage

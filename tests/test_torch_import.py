"""Golden round-trip test for the torch-checkpoint importer.

Builds a stage-1 checkpoint dict exactly as the reference trainer saves it
(src/trainers/train_lidf.py:349-371) from randomly-initialized reference
modules, imports it, and checks (a) the converted tree is structurally
IDENTICAL to our model's init tree (every leaf path + shape — so a tolerant
load takes every value, nothing silently falls back), and (b) decoder forward
parity through the imported weights.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/src")

from models import implicit_net as ref_imnet  # noqa: E402
from models import resnet_dilated as ref_resnet  # noqa: E402

from implicit_depth_tpu.utils.torch_import import (  # noqa: E402
    convert_lidf_checkpoint,
    convert_refine_checkpoint,
    import_torch_checkpoint,
)


def _fake_pnet_sd(gf=32, out=128, inp=6):
    """PointNet2Stage state dict by name/shape (src/models/pointnet.py:7-38);
    the real module can't be instantiated here (torch_scatter not in image)."""
    g = torch.Generator().manual_seed(0)
    dims = {"point_lin1": (gf, inp), "point_lin2": (out // 2, gf),
            "vox_lin1": (out // 2, out // 2), "point_lin3": (out, out),
            "point_lin4": (out, out), "vox_lin2": (out, out)}
    sd = {}
    for name, (o, i) in dims.items():
        sd[name + ".weight"] = torch.randn(o, i, generator=g)
        sd[name + ".bias"] = torch.randn(o, generator=g)
    return sd


def _shape_map(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.shape(leaf) for path, leaf in flat}


@pytest.fixture(scope="module")
def ref_ckpt():
    resnet = ref_resnet.Resnet34_8s(inp_ch=3, out_ch=32)
    offset_dec = ref_imnet.IEF(torch.device("cpu"), inp_dim=385, out_dim=1,
                               gf_dim=64, n_iter=2)
    prob_dec = ref_imnet.IMNet(inp_dim=385, out_dim=1, gf_dim=64)
    return {
        "resnet_model": resnet.state_dict(),
        "pnet_model": _fake_pnet_sd(),
        "offset_dec": offset_dec.state_dict(),
        "prob_dec": prob_dec.state_dict(),
        "optimizer": {},
        "epoch": 59,
        "xyz_err": 0.05,
    }, offset_dec, prob_dec


def test_converted_tree_matches_init_structure(ref_ckpt):
    ckpt, _, _ = ref_ckpt
    params, stats, meta = convert_lidf_checkpoint(ckpt)
    assert meta["epoch"] == 59 and meta["xyz_err"] == pytest.approx(0.05)

    from implicit_depth_tpu.config import load_config
    from implicit_depth_tpu.builder import build_lidf, build_static
    from implicit_depth_tpu.models.lidf import prepare_inputs
    from implicit_depth_tpu.data.synthetic import synthetic_sample

    cfg = load_config(overrides={
        "dataset": {"img_width": 64, "img_height": 48},
        "grid": {"miss_sample_num": 64, "valid_sample_num": 64},
        "tpu": {"max_pairs_per_ray": 4, "compute_dtype": "float32"}})
    static = build_static(cfg)
    model = build_lidf(cfg, static)
    s = synthetic_sample(np.random.default_rng(0), 48, 64)
    batch = {k: jnp.asarray(v)[None] for k, v in s.items() if k != "item_path"}
    inputs = prepare_inputs(static, batch, jax.random.key(0), train=True)
    variables = model.init(jax.random.key(0), inputs, train=False,
                           use_gt_label=True)

    # every init leaf exists in the conversion with the same shape — and
    # nothing extra: a tolerant restore takes 100% of the imported values
    assert _shape_map(params) == _shape_map(variables["params"])
    assert _shape_map(stats) == _shape_map(variables["batch_stats"])


def test_imported_decoder_forward_parity(ref_ckpt):
    """The imported decoders, fed OUR embedding layout (spatial-major ROI
    flatten), must reproduce the reference decoders fed THEIR layout
    (channel-major, pipeline.py:384-389) — i.e. the importer's layer-1 row
    permutation is the correct change of basis."""
    from implicit_depth_tpu.utils.torch_import import roi_row_permutation

    ckpt, offset_dec, prob_dec = ref_ckpt
    params, _, _ = convert_lidf_checkpoint(ckpt)
    x_ref = np.random.default_rng(1).normal(size=(16, 385)).astype(np.float32)
    # our input layout: dim i holds ref dim perm[i] inside the roi block
    perm = np.arange(385)
    block = roi_row_permutation(128, 32, 4)
    perm[128:256] = block
    x_ours = x_ref[:, perm]

    from implicit_depth_tpu.models.imnet import IEF, IMNet
    offset_dec.eval(), prob_dec.eval()
    with torch.no_grad():
        want_off = offset_dec(torch.from_numpy(x_ref)).numpy()
        want_prob = prob_dec(torch.from_numpy(x_ref)).numpy()
    got_off = np.asarray(IEF(out_dim=1, gf_dim=64, n_iter=2).apply(
        {"params": params["offset_dec"]}, jnp.asarray(x_ours)))
    got_prob = np.asarray(IMNet(out_dim=1, gf_dim=64).apply(
        {"params": params["prob_dec"]}, jnp.asarray(x_ours)))
    np.testing.assert_allclose(got_off, want_off, atol=1e-5)
    np.testing.assert_allclose(got_prob, want_prob, atol=1e-5)


def test_import_roundtrip_via_orbax(tmp_path, ref_ckpt):
    """torch.save -> import_torch_checkpoint -> restore_params_only."""
    ckpt, _, _ = ref_ckpt
    pth = str(tmp_path / "best_network.pth")
    torch.save(ckpt, pth)
    out = str(tmp_path / "imported")
    assert import_torch_checkpoint(pth, out) == "lidf"

    from implicit_depth_tpu.train.checkpoint import restore_params_only
    params, _, _meta = convert_lidf_checkpoint(ckpt), None, None
    converted = convert_lidf_checkpoint(ckpt)[0]
    template = {"params": jax.tree.map(lambda a: np.zeros_like(a), converted),
                "batch_stats": {}}
    loaded, _ = restore_params_only(out, template)
    want = np.asarray(converted["offset_dec"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(loaded["offset_dec"]["Dense_0"]["kernel"]), want)


def test_refine_checkpoint_detection(tmp_path):
    ckpt = {"pnet_model_refine": _fake_pnet_sd(),
            "offset_dec_refine": ref_imnet.IEF(
                torch.device("cpu"), inp_dim=334, out_dim=1, gf_dim=64,
                n_iter=2).state_dict(),
            "epoch": 29}
    params, stats, meta = convert_refine_checkpoint(ckpt)
    assert set(params) == {"pnet", "offset_dec"} and stats == {}
    pth = str(tmp_path / "refine.pth")
    torch.save(ckpt, pth)
    assert import_torch_checkpoint(pth, str(tmp_path / "imp")) == "refine"

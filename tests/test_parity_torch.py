"""Numerical parity against the reference torch modules (used as a TEST
ORACLE only — imported from /root/reference, never copied).

Covers: positional encoding layout, IMNet and IEF forward with transplanted
weights, and the dilated ResNet34-8s backbone. PointNet parity is covered
behaviorally in test_models (the reference module needs torch_scatter, which
this image lacks).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/src")

from models import implicit_net as ref_imnet  # noqa: E402  (reference oracle)

from implicit_depth_tpu.models.embedder import positional_encoding  # noqa: E402
from implicit_depth_tpu.models.imnet import IEF, IMNet  # noqa: E402


def test_posenc_matches_reference(rng):
    x = rng.normal(size=(16, 3)).astype(np.float32)
    for multires in (4, 8):
        ref_fn, ch = ref_imnet.get_embedder(multires)
        want = ref_fn(torch.from_numpy(x)).numpy()
        got = np.asarray(positional_encoding(jnp.asarray(x), multires))
        assert got.shape[-1] == ch
        np.testing.assert_allclose(got, want, atol=1e-5)


def _transplant_mlp4(params_mlp4, torch_linears):
    """Copy torch Linear weights into our _MLP4 param dict (transposed)."""
    for i, lin in enumerate(torch_linears):
        layer = params_mlp4[f"Dense_{i}"]
        layer["kernel"] = jnp.asarray(lin.weight.detach().numpy().T)
        layer["bias"] = jnp.asarray(lin.bias.detach().numpy())


def test_imnet_matches_reference(rng):
    x = rng.normal(size=(32, 385)).astype(np.float32)
    ref = ref_imnet.IMNet(inp_dim=385, out_dim=1, gf_dim=64, use_sigmoid=False)
    ref.eval()
    want = ref(torch.from_numpy(x)).detach().numpy()

    model = IMNet(out_dim=1, gf_dim=64)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(lambda a: a, variables["params"])  # mutable copy
    _transplant_mlp4(params["_MLP4_0"],
                     [ref.linear_1, ref.linear_2, ref.linear_3, ref.linear_4])
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ief_matches_reference(rng):
    x = rng.normal(size=(32, 385)).astype(np.float32)
    ref = ref_imnet.IEF(torch.device("cpu"), inp_dim=385, out_dim=1, gf_dim=64,
                        n_iter=2, use_sigmoid=False)
    ref.eval()
    want = ref(torch.from_numpy(x)).detach().numpy()

    model = IEF(out_dim=1, gf_dim=64, n_iter=2)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree.map(lambda a: a, variables["params"])
    enc = params["Dense_0"]
    enc["kernel"] = jnp.asarray(ref.offset_enc.weight.detach().numpy().T)
    enc["bias"] = jnp.asarray(ref.offset_enc.bias.detach().numpy())
    _transplant_mlp4(params["_MLP4_0"],
                     [ref.linear_1, ref.linear_2, ref.linear_3, ref.linear_4])
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resnet34_8s_matches_reference(rng):
    """Dilated backbone parity with transplanted weights (eval mode)."""
    from models import resnet_dilated as ref_resnet  # noqa: E402
    from implicit_depth_tpu.models.resnet import ResNet34_8s

    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    ref = ref_resnet.Resnet34_8s(inp_ch=3, out_ch=8)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    model = ResNet34_8s(out_ch=8)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    tnet = ref.resnet34_8s

    def put_conv(dst, tconv):
        dst["kernel"] = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)

    def put_bn(pdst, sdst, tbn):
        pdst["scale"] = tbn.weight.detach().numpy()
        pdst["bias"] = tbn.bias.detach().numpy()
        sdst["mean"] = tbn.running_mean.detach().numpy()
        sdst["var"] = tbn.running_var.detach().numpy()

    put_conv(params["conv1"], tnet.conv1)
    put_bn(params["bn1"], stats["bn1"], tnet.bn1)
    tlayers = [tnet.layer1, tnet.layer2, tnet.layer3, tnet.layer4]
    for stage, tlayer in enumerate(tlayers):
        for i, tblock in enumerate(tlayer):
            name = f"layer{stage + 1}_{i}"
            put_conv(params[name]["conv1"], tblock.conv1)
            put_conv(params[name]["conv2"], tblock.conv2)
            put_bn(params[name]["bn1"], stats[name]["bn1"], tblock.bn1)
            put_bn(params[name]["bn2"], stats[name]["bn2"], tblock.bn2)
            if tblock.downsample is not None:
                put_conv(params[name]["down_conv"], tblock.downsample[0])
                put_bn(params[name]["down_bn"], stats[name]["down_bn"],
                       tblock.downsample[1])
    params["fc"]["kernel"] = tnet.fc.weight.detach().numpy().transpose(2, 3, 1, 0)
    params["fc"]["bias"] = tnet.fc.bias.detach().numpy()

    got = np.asarray(model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

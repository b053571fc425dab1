"""MobileNetV2 trunk numerics vs torch (CPU), weight-transplanted.

Pins the style-extractor trunk against the semantics the reference gets
from torchvision (text_style.py:43-59): torch Conv2d explicit padding
((k-1)//2 per side, incl. stride-2), depthwise grouping, eval-mode
BatchNorm2d off running stats (eps 1e-5), ReLU6, the inverted-residual
wiring, and the AvgPool2d(3,3) -> AdaptiveAvgPool2d((1,14)) pooling pair.

The full-trunk test builds a torch module replicating torchvision's
published `features` Sequential layout (so its state_dict carries the
exact `features.N...` key names), runs the production converter
(dhg/tools/convert_torchvision_mnv2.py::convert) over that state_dict,
and compares end-to-end style vectors — converter verified against real
torch tensors, not a name list the repo wrote for itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn_t = torch.nn


def _randomize_bn(bn: "nn_t.BatchNorm2d", rng: np.random.RandomState) -> None:
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(bn.num_features).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(bn.num_features).astype(np.float32) * 0.1))
        bn.running_mean.copy_(
            torch.from_numpy(rng.randn(bn.num_features).astype(np.float32) * 0.2)
        )
        bn.running_var.copy_(
            torch.from_numpy(rng.rand(bn.num_features).astype(np.float32) + 0.3)
        )


def _conv_bn_relu_torch(cin, cout, k, stride=1, groups=1):
    """torchvision's ConvBNActivation: Conv2d(bias=False) + BN + ReLU6."""
    return nn_t.Sequential(
        nn_t.Conv2d(
            cin, cout, k, stride=stride, padding=(k - 1) // 2, groups=groups, bias=False
        ),
        nn_t.BatchNorm2d(cout),
        nn_t.ReLU6(inplace=True),
    )


def _transplant_convbn(flax_params, flax_stats, tseq):
    """torch [Conv2d, BN] -> dhg ConvBNReLU param/stat dicts."""
    w = tseq[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    flax_params["conv"] = {"kernel": jnp.asarray(w)}
    flax_params["bn"] = {
        "scale": jnp.asarray(tseq[1].weight.detach().numpy()),
        "bias": jnp.asarray(tseq[1].bias.detach().numpy()),
    }
    flax_stats["bn"] = {
        "mean": jnp.asarray(tseq[1].running_mean.numpy()),
        "var": jnp.asarray(tseq[1].running_var.numpy()),
    }


@pytest.mark.parametrize(
    "cin,cout,k,stride,groups,h,w",
    [
        (3, 16, 3, 2, 1, 33, 47),  # stem-style stride-2, odd spatial dims
        (16, 32, 1, 1, 1, 12, 20),  # pointwise
        (24, 24, 3, 1, 24, 11, 19),  # depthwise stride 1
        (24, 24, 3, 2, 24, 11, 19),  # depthwise stride 2, odd dims
    ],
)
def test_convbnrelu_matches_torch(cin, cout, k, stride, groups, h, w):
    from dhg.models.mobilenetv2 import ConvBNReLU

    rng = np.random.RandomState(0)
    torch.manual_seed(0)
    tmod = _conv_bn_relu_torch(cin, cout, k, stride, groups).eval()
    _randomize_bn(tmod[1], rng)

    x = rng.randn(2, h, w, cin).astype(np.float32) * 2.0
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    params, stats = {}, {}
    _transplant_convbn(params, stats, tmod)
    jmod = ConvBNReLU(cout, kernel=k, stride=stride, groups=groups)
    out_j = jmod.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)


class _TorchInvertedResidual(nn_t.Module):
    """torchvision's InvertedResidual, replicated with its exact child names."""

    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers.append(_conv_bn_relu_torch(cin, hidden, 1))
        layers.append(_conv_bn_relu_torch(hidden, hidden, 3, stride, groups=hidden))
        layers.append(nn_t.Conv2d(hidden, cout, 1, bias=False))
        layers.append(nn_t.BatchNorm2d(cout))
        self.conv = nn_t.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


@pytest.mark.parametrize(
    "cin,cout,stride,expand",
    [
        (16, 24, 2, 6),  # expanding, downsampling
        (24, 24, 1, 6),  # residual
        (32, 16, 1, 1),  # t=1 (no expand conv), torchvision block 1 shape
    ],
)
def test_inverted_residual_matches_torch(cin, cout, stride, expand):
    from dhg.models.mobilenetv2 import InvertedResidual

    rng = np.random.RandomState(1)
    torch.manual_seed(1)
    tmod = _TorchInvertedResidual(cin, cout, stride, expand).eval()
    for m in tmod.modules():
        if isinstance(m, nn_t.BatchNorm2d):
            _randomize_bn(m, rng)

    x = rng.randn(2, 13, 21, cin).astype(np.float32)
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    params, stats = {}, {}
    seq = list(tmod.conv)
    names = (["expand"] if expand != 1 else []) + ["dw"]
    for name, blk in zip(names, seq[: len(names)]):
        p, s = {}, {}
        _transplant_convbn(p, s, blk)
        params[name], stats[name] = p, s
    proj, proj_bn = seq[-2], seq[-1]
    params["project"] = {
        "kernel": jnp.asarray(proj.weight.detach().numpy().transpose(2, 3, 1, 0))
    }
    params["project_bn"] = {
        "scale": jnp.asarray(proj_bn.weight.detach().numpy()),
        "bias": jnp.asarray(proj_bn.bias.detach().numpy()),
    }
    stats["project_bn"] = {
        "mean": jnp.asarray(proj_bn.running_mean.numpy()),
        "var": jnp.asarray(proj_bn.running_var.numpy()),
    }

    jmod = InvertedResidual(cout, stride=stride, expand=expand)
    out_j = jmod.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)


class _TorchMNV2Features(nn_t.Module):
    """torchvision mobilenet_v2().features, replicated so state_dict() keys
    are exactly the published `features.N...` names the converter maps."""

    def __init__(self):
        super().__init__()
        from dhg.models.mobilenetv2 import INVERTED_RESIDUAL_SETTINGS

        feats = [_conv_bn_relu_torch(3, 32, 3, stride=2)]
        cin = 32
        for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
            for i in range(n):
                feats.append(_TorchInvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(_conv_bn_relu_torch(cin, 1280, 1))
        self.features = nn_t.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


def test_full_style_extractor_matches_torch_via_converter():
    """Full pipeline: grayscale image -> [B, 14, 1280] style vector, dhg
    (converter-loaded weights) vs the reference StyleExtractor math
    (text_style.py:43-59) on a torchvision-layout torch trunk."""
    from dhg.models.style_extractor import StyleExtractor, _fill_from_flat
    from dhg.tools.convert_torchvision_mnv2 import convert

    rng = np.random.RandomState(2)
    torch.manual_seed(2)
    tnet = _TorchMNV2Features().eval()
    for m in tnet.modules():
        if isinstance(m, nn_t.BatchNorm2d):
            _randomize_bn(m, rng)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    flat = convert(sd)

    import jax

    jmod = StyleExtractor()
    img = (rng.rand(2, 96, 200) * 255).astype(np.float32)
    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(img))
    variables = _fill_from_flat(variables, flat)
    out_j = np.asarray(jmod.apply(variables, jnp.asarray(img)))

    # Reference StyleExtractor forward (text_style.py:43-59) on the torch trunk.
    with torch.no_grad():
        x = torch.from_numpy(img[:, None]) / 127.5 - 1
        x = x.repeat(1, 3, 1, 1)
        x = tnet(x)
        x = nn_t.AvgPool2d(kernel_size=3, stride=3)(x)
        x = nn_t.AdaptiveAvgPool2d((1, 14))(x)
        out_t = x.squeeze(2).permute(0, 2, 1).numpy()

    assert out_j.shape == (2, 14, 1280)
    np.testing.assert_allclose(out_j, out_t, rtol=1e-3, atol=1e-4)


def test_strict_style_extractor_raises_on_missing_weights(tmp_path):
    from dhg.models.style_extractor import init_style_extractor

    with pytest.raises(FileNotFoundError):
        init_style_extractor(weights_path=tmp_path / "nope.npz", strict=True)


def test_missing_weights_warns():
    from dhg.models.style_extractor import init_style_extractor

    with pytest.warns(UserWarning, match="RANDOM-INITIALIZED"):
        init_style_extractor(weights_path="/does/not/exist.npz")

"""Style extractor: output contract, pooling semantics, converter mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.models.style_extractor import (
    StyleExtractor,
    adaptive_avg_pool_width,
    avg_pool_2d_floor,
)


def test_adaptive_pool_exact_division():
    x = jnp.arange(2 * 4 * 28 * 3, dtype=jnp.float32).reshape(2, 4, 28, 3)
    out = adaptive_avg_pool_width(x, 14)
    assert out.shape == (2, 14, 3)
    # 28 -> 14: each bin is the mean of 2 adjacent columns (after H-mean).
    hm = np.asarray(x.mean(axis=1))
    expected = hm.reshape(2, 14, 2, 3).mean(axis=2)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_adaptive_pool_uneven_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 45, 8).astype(np.float32)  # NHWC, W=45 -> 14 bins
    out = adaptive_avg_pool_width(jnp.asarray(x), 14)

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    ref = torch.nn.AdaptiveAvgPool2d((1, 14))(t).squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_avg_pool_floor_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(1, 10, 44, 2).astype(np.float32)
    out = avg_pool_2d_floor(jnp.asarray(x), 3, 3)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.AvgPool2d(3, 3)(t).permute(0, 2, 3, 1).numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_style_extractor_output_shape():
    model = StyleExtractor()
    img = jnp.full((1, 96, 384), 255.0)  # small width to keep CPU time down
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.shape == (1, 14, 1280)
    assert np.all(np.isfinite(np.asarray(out)))


def test_converter_key_mapping_covers_tree():
    """The torchvision name mapping emits exactly the flax variable paths."""
    import flax

    from dhg.tools.convert_torchvision_mnv2 import convert
    from dhg.models.mobilenetv2 import INVERTED_RESIDUAL_SETTINGS, MobileNetV2Features

    # Build a fake torchvision state_dict with correctly-shaped zeros.
    tv: dict[str, np.ndarray] = {}

    def add_cbr(prefix, cin, cout, k, groups=1):
        tv[f"{prefix}.0.weight"] = np.zeros((cout, cin // groups, k, k), np.float32)
        for nm in ["weight", "bias", "running_mean", "running_var"]:
            tv[f"{prefix}.1.{nm}"] = np.zeros(cout, np.float32)

    add_cbr("features.0", 3, 32, 3)
    cin = 32
    fi = 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
        for i in range(n):
            hidden = cin * t
            blk = f"features.{fi}.conv"
            if t == 1:
                add_cbr(f"{blk}.0", hidden, hidden, 3, groups=hidden)
                proj, bn = f"{blk}.1", f"{blk}.2"
            else:
                add_cbr(f"{blk}.0", cin, hidden, 1)
                add_cbr(f"{blk}.1", hidden, hidden, 3, groups=hidden)
                proj, bn = f"{blk}.2", f"{blk}.3"
            tv[f"{proj}.weight"] = np.zeros((c, hidden, 1, 1), np.float32)
            for nm in ["weight", "bias", "running_mean", "running_var"]:
                tv[f"{bn}.{nm}"] = np.zeros(c, np.float32)
            cin = c
            fi += 1
    add_cbr(f"features.{fi}", cin, 1280, 1)

    flat = convert(tv)

    trunk = MobileNetV2Features()
    variables = jax.eval_shape(
        lambda: trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    )
    want = {
        "/".join(("params",) + k[1:]) if k[0] == "params" else "/".join(("batch_stats",) + k[1:])
        for k in flax.traverse_util.flatten_dict(variables)
    }
    # convert() emits keys rooted at mobilenet/...; re-root for comparison.
    got = {k.replace("/mobilenet/", "/") for k in flat}
    assert got == want
    # Shapes line up too.
    flat_vars = flax.traverse_util.flatten_dict(variables, sep="/")
    for k, v in flat.items():
        assert flat_vars[k.replace("/mobilenet/", "/")].shape == v.shape, k

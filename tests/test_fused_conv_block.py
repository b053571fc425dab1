"""Fused ConvBlock Pallas kernel vs the flax ConvBlock (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.kernels.fused_conv_block import conv_block_ref, fused_conv_block
from dhg.ops.conv import ConvBlock


def _weights(rng, cin, co):
    w = {
        "wskip": rng.randn(3, cin, co).astype(np.float32) * 0.2,
        "bskip": rng.randn(co).astype(np.float32) * 0.1,
        "w1": rng.randn(3, cin, co // 2).astype(np.float32) * 0.2,
        "b1": rng.randn(co // 2).astype(np.float32) * 0.1,
        "w2": rng.randn(3, co // 2, co).astype(np.float32) * 0.2,
        "b2": rng.randn(co).astype(np.float32) * 0.1,
        "wfc": rng.randn(co, co).astype(np.float32) * 0.2,
        "bfc": rng.randn(co).astype(np.float32) * 0.1,
    }
    return {k: jnp.asarray(v) for k, v in w.items()}


def _films(rng, b, co):
    f = {
        "g1": 1 + 0.1 * rng.randn(b, co // 2),
        "be1": 0.1 * rng.randn(b, co // 2),
        "g2": 1 + 0.1 * rng.randn(b, co),
        "be2": 0.1 * rng.randn(b, co),
        "g3": 1 + 0.1 * rng.randn(b, co),
        "be3": 0.1 * rng.randn(b, co),
    }
    return {k: jnp.asarray(v, jnp.float32) for k, v in f.items()}


@pytest.mark.parametrize("b,t,cin,co", [(2, 32, 16, 32), (1, 48, 32, 64)])
def test_kernel_matches_reference(b, t, cin, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, cin).astype(np.float32))
    w = _weights(rng, cin, co)
    f = _films(rng, b, co)
    args = (
        x, w["wskip"], w["bskip"], w["w1"], w["b1"], w["w2"], w["b2"],
        w["wfc"], w["bfc"], f["g1"], f["be1"], f["g2"], f["be2"], f["g3"], f["be3"],
    )
    ref = conv_block_ref(*args)
    out = fused_conv_block(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_reference_matches_flax_convblock():
    """The kernel's shifted-matmul math == the flax module's lax.conv path."""
    rng = np.random.RandomState(1)
    b, t, cin, co = 2, 40, 16, 32
    x = jnp.asarray(rng.randn(b, t, cin).astype(np.float32))
    sigma_emb = jnp.asarray(rng.randn(b, 32).astype(np.float32) * 0.3)

    block = ConvBlock(co)
    variables = block.init(jax.random.PRNGKey(0), x, sigma_emb)
    flax_out = block.apply(variables, x, sigma_emb)

    p = variables["params"]
    bound = block.bind(variables)
    g1, be1 = bound.affine1.coefficients(sigma_emb)
    g2, be2 = bound.affine2.coefficients(sigma_emb)
    g3, be3 = bound.affine3.coefficients(sigma_emb)

    ref = conv_block_ref(
        x,
        p["conv_skip"]["kernel"], p["conv_skip"]["bias"],
        p["conv1"]["kernel"], p["conv1"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
        p["fc"]["kernel"], p["fc"]["bias"],
        g1, be1, g2, be2, g3, be3,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(flax_out), rtol=1e-5, atol=1e-5)


def test_fused_gradients_match(monkeypatch):
    """custom_vjp: fused forward with jnp backward == full jnp gradients."""
    from dhg.kernels import fused_conv_block as mod

    monkeypatch.setattr(
        mod, "fused_conv_block",
        lambda *a, **k: mod.conv_block_ref(*a),  # avoid compiled pallas on CPU
    )
    rng = np.random.RandomState(2)
    b, t, cin, co = 1, 16, 8, 16
    x = jnp.asarray(rng.randn(b, t, cin).astype(np.float32))
    w = _weights(rng, cin, co)
    f = _films(rng, b, co)
    args = (
        x, w["wskip"], w["bskip"], w["w1"], w["b1"], w["w2"], w["b2"],
        w["wfc"], w["bfc"], f["g1"], f["be1"], f["g2"], f["be2"], f["g3"], f["be3"],
    )
    g_fused = jax.grad(lambda x_: mod.conv_block_fused_op(x_, *args[1:]).sum())(x)
    g_ref = jax.grad(lambda x_: mod.conv_block_ref(x_, *args[1:]).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_convblock_params_unchanged_by_refactor():
    """setup-style ConvBlock keeps the exact param tree of the compact one."""
    import flax

    block = ConvBlock(32)
    variables = jax.eval_shape(
        lambda: block.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)), jnp.zeros((1, 32))
        )
    )
    flat = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    assert set(flat) == {
        "conv_skip/kernel", "conv_skip/bias",
        "conv1/kernel", "conv1/bias",
        "conv2/kernel", "conv2/bias",
        "fc/kernel", "fc/bias",
        "affine1/gamma_emb/kernel", "affine1/gamma_emb/bias",
        "affine1/beta_emb/kernel", "affine1/beta_emb/bias",
        "affine2/gamma_emb/kernel", "affine2/gamma_emb/bias",
        "affine2/beta_emb/kernel", "affine2/beta_emb/bias",
        "affine3/gamma_emb/kernel", "affine3/gamma_emb/bias",
        "affine3/beta_emb/kernel", "affine3/beta_emb/bias",
    }
    assert flat["conv1/kernel"].shape == (3, 16, 16)
    assert flat["conv_skip/kernel"].shape == (3, 16, 32)

"""Primitive-level numerical parity vs torch (CPU), weight-transplanted.

These pin down the building-block semantics the reference relies on:
'same' conv padding, SiLU MLPs, LayerNorm(eps=1e-6, no affine), SDPA with
additive -1e9 masks, and sigmoid heads. Module-level parity then follows
from architecture wiring (asserted structurally elsewhere).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_conv1d_same_matches_torch():
    rng = np.random.RandomState(0)
    b, t, cin, cout = 2, 31, 5, 7
    x = rng.randn(b, t, cin).astype(np.float32)
    w = rng.randn(3, cin, cout).astype(np.float32)  # flax [kw, in, out]
    bias = rng.randn(cout).astype(np.float32)

    import flax.linen as nn

    conv = nn.Conv(cout, kernel_size=(3,), padding="SAME")
    out_jax = conv.apply(
        {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}, jnp.asarray(x)
    )

    tconv = torch.nn.Conv1d(cin, cout, 3, padding="same")
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))  # [out, in, kw]
        tconv.bias.copy_(torch.from_numpy(bias))
        out_t = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-5, atol=1e-5)


def test_dilated_conv1d_same_matches_torch():
    rng = np.random.RandomState(1)
    b, t, cin, cout, dil = 1, 40, 4, 6, 2
    x = rng.randn(b, t, cin).astype(np.float32)
    w = rng.randn(3, cin, cout).astype(np.float32)
    bias = np.zeros(cout, np.float32)

    import flax.linen as nn

    conv = nn.Conv(cout, kernel_size=(3,), padding="SAME", kernel_dilation=(dil,))
    out_jax = conv.apply(
        {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}}, jnp.asarray(x)
    )
    tconv = torch.nn.Conv1d(cin, cout, 3, padding="same", dilation=dil, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        out_t = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-5, atol=1e-5)


def test_ffn_matches_torch_sequential():
    """dhg FFN == torch [SiLU, Linear, SiLU, Linear] under the same weights."""
    from dhg.ops.basic import FFN

    rng = np.random.RandomState(2)
    inp, hidden, out = 6, 16, 4
    x = rng.randn(3, 5, inp).astype(np.float32)
    w1 = rng.randn(inp, hidden).astype(np.float32)
    b1 = rng.randn(hidden).astype(np.float32)
    w2 = rng.randn(hidden, out).astype(np.float32)
    b2 = rng.randn(out).astype(np.float32)

    ffn = FFN(out=out, hidden=hidden, act_before=True)
    params = {
        "fc1": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
        "fc2": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
    }
    out_jax = ffn.apply({"params": params}, jnp.asarray(x))

    tl1 = torch.nn.Linear(inp, hidden)
    tl2 = torch.nn.Linear(hidden, out)
    with torch.no_grad():
        tl1.weight.copy_(torch.from_numpy(w1.T))
        tl1.bias.copy_(torch.from_numpy(b1))
        tl2.weight.copy_(torch.from_numpy(w2.T))
        tl2.bias.copy_(torch.from_numpy(b2))
        tx = torch.from_numpy(x)
        out_t = tl2(torch.nn.functional.silu(tl1(torch.nn.functional.silu(tx)))).numpy()

    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-5, atol=1e-5)


def test_layernorm_no_affine_eps():
    import flax.linen as nn

    rng = np.random.RandomState(3)
    x = rng.randn(2, 7, 12).astype(np.float32)
    ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)
    out_jax = ln.apply({}, jnp.asarray(x))
    tln = torch.nn.LayerNorm(12, eps=1e-6, elementwise_affine=False)
    out_t = tln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4, atol=1e-5)


def test_sdpa_with_additive_mask_matches_torch():
    from dhg.ops.attention import _sdpa_jnp

    rng = np.random.RandomState(4)
    b, h, tq, tk, d = 2, 3, 10, 8, 16
    q = rng.randn(b, h, tq, d).astype(np.float32)
    k = rng.randn(b, h, tk, d).astype(np.float32)
    v = rng.randn(b, h, tk, d).astype(np.float32)
    mask = (rng.rand(b, 1, 1, tk) > 0.7).astype(np.float32)

    out_jax = _sdpa_jnp(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))

    out_t = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q),
        torch.from_numpy(k),
        torch.from_numpy(v),
        attn_mask=torch.from_numpy(mask * -1e9),
    ).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-4, atol=1e-5)


def test_sigma_embedding_matches_torch_pipeline():
    """sigma [B,1] -> SiLU -> Linear(2048) -> SiLU -> Linear(32), transplanted."""
    from dhg.ops.basic import FFN

    rng = np.random.RandomState(5)
    sigma = rng.rand(4, 1).astype(np.float32)
    w1 = (rng.randn(1, 64) * 0.1).astype(np.float32)
    b1 = np.zeros(64, np.float32)
    w2 = (rng.randn(64, 8) * 0.1).astype(np.float32)
    b2 = np.zeros(8, np.float32)

    ffn = FFN(out=8, hidden=64)
    params = {
        "fc1": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
        "fc2": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
    }
    out_jax = ffn.apply({"params": params}, jnp.asarray(sigma))

    t = torch.from_numpy(sigma)
    t = torch.nn.functional.silu(t)
    t = torch.nn.functional.silu(t @ torch.from_numpy(w1) + torch.from_numpy(b1))
    out_t = (t @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_t, rtol=1e-5, atol=1e-6)

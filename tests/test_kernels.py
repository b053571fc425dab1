"""Pallas fused attention vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.kernels.fused_attention import fused_attention
from dhg.ops.attention import _sdpa_jnp


@pytest.mark.parametrize("tq,tk", [(64, 50), (96, 96), (32, 14)])
def test_fused_matches_jnp(tq, tk):
    b, h, d = 2, 3, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, tq, d))
    k = jax.random.normal(kk, (b, h, tk, d))
    v = jax.random.normal(kv, (b, h, tk, d))
    # Mask out the tail keys of batch row 1.
    mask = jnp.zeros((b, 1, 1, tk)).at[1, :, :, tk // 2 :].set(1.0)

    ref = _sdpa_jnp(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)


def test_fused_gradients_match_jnp(monkeypatch):
    """custom_vjp route: fused forward, jnp-math backward — grads identical."""
    import dhg.kernels.fused_attention as fa
    import dhg.kernels.runtime as rt
    from dhg.ops.attention import scaled_dot_product_attention

    monkeypatch.setattr(rt, "use_fused_attention", lambda: True)
    orig = fa.fused_attention
    monkeypatch.setattr(
        fa, "fused_attention", lambda q, k, v, m=None: orig(q, k, v, m, interpret=True)
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 12, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 12, 8))
    mask = jnp.zeros((1, 1, 1, 12)).at[0, :, :, 8:].set(1.0)

    g_fused = jax.grad(lambda q_: scaled_dot_product_attention(q_, k, v, mask).sum())(q)
    g_ref = jax.grad(lambda q_: _sdpa_jnp(q_, k, v, mask).sum())(q)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)


def test_no_module_shadowing():
    """dhg.kernels must not re-export the function over the submodule."""
    import importlib

    mod = importlib.import_module("dhg.kernels.fused_attention")
    import dhg.kernels as pkg

    assert getattr(pkg, "fused_attention", mod) is mod or not hasattr(pkg, "fused_attention")


def test_fused_no_mask():
    b, h, tq, tk, d = 1, 2, 24, 24, 32
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, tk, d))
    ref = _sdpa_jnp(q, k, v, None)
    out = fused_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)

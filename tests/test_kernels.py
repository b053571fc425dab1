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


def test_fused_no_mask():
    b, h, tq, tk, d = 1, 2, 24, 24, 32
    q = jax.random.normal(jax.random.PRNGKey(1), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(3), (b, h, tk, d))
    ref = _sdpa_jnp(q, k, v, None)
    out = fused_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)

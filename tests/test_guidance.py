"""Classifier-free-style guidance in the sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.inference import generate
from dhg.models.denoiser import DiffusionModel


@pytest.fixture(scope="module")
def small():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    text = jnp.zeros((2, 20), jnp.int32).at[:, :4].set(5).at[:, 4].set(1)
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 1280))
    return model, params, text, style


def test_guidance_none_equals_one(small):
    model, params, text, style = small
    k = jax.random.PRNGKey(3)
    a = generate(model, params, text, style, k, seq_len=24, guidance_scale=None)
    b = generate(model, params, text, style, k, seq_len=24, guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_guidance_scale_is_traced_one_program(small):
    """The guidance scale is a TRACED argument: two different scales must
    share one compiled sampler program (round-3 serving-warmup design)."""
    from dhg.inference import _sample_jit

    model, params, text, style = small
    k = jax.random.PRNGKey(9)
    a = generate(model, params, text, style, k, seq_len=24, guidance_scale=2.0)
    n1 = _sample_jit._cache_size()
    b = generate(model, params, text, style, k, seq_len=24, guidance_scale=3.5)
    n2 = _sample_jit._cache_size()
    assert n2 == n1, "a new guidance scale must not trigger a recompile"
    assert not np.allclose(np.asarray(a[..., :2]), np.asarray(b[..., :2]))


def test_guidance_changes_output(small):
    model, params, text, style = small
    k = jax.random.PRNGKey(4)
    a = generate(model, params, text, style, k, seq_len=24)
    b = generate(model, params, text, style, k, seq_len=24, guidance_scale=2.0)
    assert a.shape == b.shape == (2, 24, 3)
    assert np.all(np.isfinite(np.asarray(b)))
    assert not np.allclose(np.asarray(a[..., :2]), np.asarray(b[..., :2]))

"""Validation evaluation utility."""

import numpy as np

import jax

from dhg.data.pipeline import synthetic_cache
from dhg.eval import evaluate
from dhg.models.denoiser import DiffusionModel

import jax.numpy as jnp


def test_evaluate_returns_finite_triplet():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=8, max_seq_len=96, max_text_len=20, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]
    out = evaluate(model, params, cache, batch_size=4, seed=0)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))
    # total = score + pen
    assert np.isclose(out[0], out[1] + out[2], rtol=1e-5)


def test_evaluate_deterministic():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=8, max_seq_len=96, max_text_len=20, seed=1)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]
    a = evaluate(model, params, cache, batch_size=4, seed=7)
    b = evaluate(model, params, cache, batch_size=4, seed=7)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_evaluate_includes_tail_batch():
    """n % batch_size != 0: every sample must contribute (the tail batch is
    not dropped). The tail samples carry enormous strokes, so dropping them
    would leave the loss near the clean-8-sample value."""
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=10, max_seq_len=96, max_text_len=20, seed=2)
    cache.strokes[8:, :, :2] = 50.0  # pathological tail -> huge score loss
    params = model.init(
        jax.random.PRNGKey(2),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]

    full = evaluate(model, params, cache, batch_size=4, seed=0)

    import copy

    head = copy.deepcopy(cache)
    head.strokes = cache.strokes[:8]
    head.text = cache.text[:8]
    head.style = cache.style[:8]
    head.sample_ids = cache.sample_ids[:8]
    clean = evaluate(model, params, head, batch_size=4, seed=0)

    assert full[0] > clean[0] * 1.15, (full[0], clean[0])

"""Loss math vs independent numpy computation (reference loss.py:29-37)."""

import numpy as np

import jax
import jax.numpy as jnp

from dhg.core.losses import diffusion_loss, pen_loss_fn, score_loss_fn


def test_score_loss_matches_numpy():
    rng = np.random.RandomState(0)
    eps = rng.randn(4, 16, 2).astype(np.float32)
    pred = rng.randn(4, 16, 2).astype(np.float32)
    expected = np.mean(np.sum((eps - pred) ** 2, axis=-1))
    assert np.isclose(float(score_loss_fn(eps, pred)), expected, rtol=1e-6)


def test_pen_loss_alpha_weighting():
    rng = np.random.RandomState(1)
    pen = (rng.rand(4, 16) > 0.5).astype(np.float32)
    pred = np.clip(rng.rand(4, 16), 0.01, 0.99).astype(np.float32)
    alphas = rng.rand(4, 1).astype(np.float32)

    p = np.clip(pen, 1e-7, 1 - 1e-7)
    bce = -(p * np.log(pred) + (1 - p) * np.log(1 - pred))
    expected = np.mean(bce.mean(axis=1) * alphas[:, 0])
    assert np.isclose(float(pen_loss_fn(pen, pred, alphas)), expected, rtol=1e-5)


def test_total_is_sum():
    rng = np.random.RandomState(2)
    eps = rng.randn(2, 8, 2).astype(np.float32)
    pred = rng.randn(2, 8, 2).astype(np.float32)
    pen = (rng.rand(2, 8) > 0.5).astype(np.float32)
    pen_pred = np.clip(rng.rand(2, 8), 0.01, 0.99).astype(np.float32)
    alphas = rng.rand(2, 1).astype(np.float32)
    total, score, pl = diffusion_loss(eps, pred, pen, pen_pred, alphas)
    assert np.isclose(float(total), float(score) + float(pl), rtol=1e-6)


def test_bce_matches_torch_including_saturation():
    """Forward AND gradient parity with torch F.binary_cross_entropy, incl.
    saturated probabilities (p ~ 0, p ~ 1) where the reference's unclamped
    prediction path produces huge corrective gradients (loss.py:32)."""
    import pytest

    torch = pytest.importorskip("torch")
    from dhg.core.losses import binary_cross_entropy

    p_vals = np.array(
        [0.5, 0.01, 0.99, 1e-8, 1.0 - 1e-7, 1e-12, 1.0, 0.0, 1e-30],
        dtype=np.float32,
    )
    t_vals = np.array([1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0], dtype=np.float32)

    tp = torch.tensor(p_vals, requires_grad=True)
    tt = torch.tensor(t_vals)
    tl = torch.nn.functional.binary_cross_entropy(tp, tt, reduction="none")
    tl.sum().backward()

    jl = binary_cross_entropy(jnp.asarray(p_vals), jnp.asarray(t_vals))
    jg = jax.grad(lambda p: jnp.sum(binary_cross_entropy(p, jnp.asarray(t_vals))))(
        jnp.asarray(p_vals)
    )

    np.testing.assert_allclose(np.asarray(jl), tl.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jg), tp.grad.numpy(), rtol=1e-5)

"""Loss math vs independent numpy computation (reference loss.py:29-37)."""

import numpy as np

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

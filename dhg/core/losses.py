"""Training losses — score MSE + alpha_bar-weighted pen-lift BCE.

Behavior parity with the reference loss (loss.py:29-37):
  score_loss = mean over (B, T) of sum over xy of (eps - eps_hat)^2
  pen_loss   = mean over B of [ mean over T of BCE(p_hat, clip(p)) * alpha_bar ]
with targets clipped to [1e-7, 1 - 1e-7]. Pen BCE is down-weighted at high
noise by alpha_bar.
"""

from __future__ import annotations

import jax.numpy as jnp


def score_loss_fn(eps: jnp.ndarray, eps_pred: jnp.ndarray) -> jnp.ndarray:
    """MSE over noise prediction: mean(sum((eps - eps_pred)^2, axis=-1))."""
    return jnp.mean(jnp.sum((eps - eps_pred) ** 2, axis=-1))


def pen_loss_fn(
    pen: jnp.ndarray, pen_pred: jnp.ndarray, alphas: jnp.ndarray
) -> jnp.ndarray:
    """alpha_bar-weighted binary cross-entropy over pen-lift probabilities.

    pen: [B, T] targets in {0, 1}; pen_pred: [B, T] probabilities in (0, 1);
    alphas: [B, 1] alpha_bar values.
    """
    pen = jnp.clip(pen, 1e-7, 1.0 - 1e-7)
    # BCE on probabilities (the model head ends in a sigmoid). Clip the
    # prediction for log-safety only; gradients match torch's
    # F.binary_cross_entropy away from saturation.
    p = jnp.clip(pen_pred, 1e-7, 1.0 - 1e-7)
    bce = -(pen * jnp.log(p) + (1.0 - pen) * jnp.log(1.0 - p))
    per_sample = jnp.mean(bce, axis=1) * jnp.squeeze(alphas, axis=-1)
    return jnp.mean(per_sample)


def diffusion_loss(
    eps: jnp.ndarray,
    eps_pred: jnp.ndarray,
    pen: jnp.ndarray,
    pen_pred: jnp.ndarray,
    alphas: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Combined loss. Returns (total, score_loss, pen_loss)."""
    s = score_loss_fn(eps, eps_pred)
    p = pen_loss_fn(pen, pen_pred, alphas)
    return s + p, s, p

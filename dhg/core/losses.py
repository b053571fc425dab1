"""Training losses — score MSE + alpha_bar-weighted pen-lift BCE.

Behavior parity with the reference loss (loss.py:29-37):
  score_loss = mean over (B, T) of sum over xy of (eps - eps_hat)^2
  pen_loss   = mean over B of [ mean over T of BCE(p_hat, clip(p)) * alpha_bar ]
with targets clipped to [1e-7, 1 - 1e-7]. Pen BCE is down-weighted at high
noise by alpha_bar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def score_loss_fn(eps: jnp.ndarray, eps_pred: jnp.ndarray) -> jnp.ndarray:
    """MSE over noise prediction: mean(sum((eps - eps_pred)^2, axis=-1))."""
    return jnp.mean(jnp.sum((eps - eps_pred) ** 2, axis=-1))


@jax.custom_vjp
def binary_cross_entropy(p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE on probabilities with torch semantics.

    torch.nn.functional.binary_cross_entropy clamps the LOG OUTPUTS at -100
    (not the probabilities), and its backward uses
    (p - t) / max(p * (1 - p), 1e-12) — so a saturated sigmoid head still
    receives a (huge) corrective gradient. The reference clamps only the
    TARGET (loss.py:32); the prediction goes in raw. Reproduced exactly here
    (forward + backward) so training dynamics match the reference even at
    head saturation.
    """
    return -(
        target * jnp.maximum(jnp.log(p), -100.0)
        + (1.0 - target) * jnp.maximum(jnp.log1p(-p), -100.0)
    )


def _bce_fwd(p, target):
    return binary_cross_entropy(p, target), (p, target)


def _bce_bwd(res, g):
    p, target = res
    grad_p = g * (p - target) / jnp.maximum(p * (1.0 - p), 1e-12)
    grad_t = g * (jnp.maximum(jnp.log1p(-p), -100.0) - jnp.maximum(jnp.log(p), -100.0))
    return grad_p, grad_t


binary_cross_entropy.defvjp(_bce_fwd, _bce_bwd)


def pen_loss_fn(
    pen: jnp.ndarray, pen_pred: jnp.ndarray, alphas: jnp.ndarray
) -> jnp.ndarray:
    """alpha_bar-weighted binary cross-entropy over pen-lift probabilities.

    pen: [B, T] targets in {0, 1}; pen_pred: [B, T] probabilities in (0, 1);
    alphas: [B, 1] alpha_bar values. Only the TARGET is clamped
    (reference loss.py:32); the prediction follows torch BCE semantics.
    """
    pen = jnp.clip(pen, 1e-7, 1.0 - 1e-7)
    bce = binary_cross_entropy(pen_pred, pen)
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

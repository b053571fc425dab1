"""Validation evaluation — a capability superset (the reference never
evaluates its validation split; data/splits.json carries one, SURVEY §2).

Computes the mean diffusion loss over a cache at a fixed grid of alpha_bar
levels (deterministic: no random alpha sampling, fixed noise key per sample),
so val numbers are comparable across runs/steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhg.core.losses import diffusion_loss
from dhg.core.schedule import get_alpha_set


def make_eval_fn(model, batch_size: int = 0, n_levels: int = 6):
    """Returns eval_step(params, batch, key) -> [3] (total, score, pen).

    The returned closure carries its own jit cache: build it ONCE per
    model and reuse it across validation boundaries (Trainer caches it),
    or every call recompiles (~15 s CPU / 1-6 min remote TPU). batch_size
    is unused (kept for signature compat) — the jit specializes per input
    shape, so one eval_step serves every batch size including the tail.
    """
    alpha_set = get_alpha_set()
    # Evenly spaced schedule indices, always including the extremes.
    idx = jnp.linspace(0, alpha_set.shape[0] - 1, n_levels).astype(jnp.int32)
    levels = alpha_set[idx]

    @jax.jit
    def eval_step(params, strokes3, text, style, key):
        x, pen = strokes3[..., :2], strokes3[..., 2]

        def at_level(alpha):
            alphas = jnp.full((strokes3.shape[0], 1), alpha)
            eps = jax.random.normal(key, x.shape)
            xt = jnp.sqrt(alphas)[..., None] * x + jnp.sqrt(1 - alphas)[..., None] * eps
            eps_pred, pen_pred = model.apply(
                {"params": params}, xt, text, jnp.sqrt(alphas), style
            )
            total, score, pen_l = diffusion_loss(eps, eps_pred, pen, pen_pred, alphas)
            return jnp.stack([total, score, pen_l])

        return jnp.mean(jax.vmap(at_level)(levels), axis=0)

    return eval_step


def evaluate(model, params, cache, batch_size: int = 16, seed: int = 0, eval_step=None):
    """Mean (total, score, pen) loss over a packed cache.

    eval_step: a prebuilt make_eval_fn closure — pass it to avoid a fresh
    jit cache (and thus a recompile) per evaluate() call."""
    import numpy as np

    if eval_step is None:
        eval_step = make_eval_fn(model, batch_size)
    n = len(cache)
    key = jax.random.PRNGKey(seed)
    totals, weights = [], []
    # Every sample contributes: the tail batch (n % batch_size) runs at its
    # natural size (one extra compile) and the mean is sample-weighted.
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        m = eval_step(
            params,
            jnp.asarray(cache.strokes[sl]),
            jnp.asarray(cache.text[sl]),
            jnp.asarray(cache.style[sl]),
            jax.random.fold_in(key, i),
        )
        totals.append(np.asarray(m))
        weights.append(sl.stop - sl.start)
    return np.average(np.stack(totals), axis=0, weights=weights)

"""Diffusion noise schedule — pure jnp, precomputed tables.

Notation follows the reference (see /root/reference/diffusion_handwriting_generation/
utils/nn.py:1-5): the variable "alpha" denotes alpha_bar = cumprod(1 - beta);
the paper's per-step alpha is (1 - beta).

Behavior parity:
  * get_beta_set() == 0.02 + explin(1e-5, 0.4, 60)   (utils/nn.py:19-39)
  * alpha_set == cumprod(1 - beta_set)               (train.py:90, inference.py:81)
  * training samples alpha_bar CONTINUOUSLY: a random adjacent pair of alpha
    levels, then uniform in between                  (utils/nn.py:42-61)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_STEPS = 60


def explin(min_val: float, max_val: float, num: int) -> jnp.ndarray:
    """Exponentially spaced values between min_val and max_val (log-linear)."""
    return jnp.exp(jnp.linspace(jnp.log(min_val), jnp.log(max_val), num))


def get_beta_set(n_steps: int = N_STEPS) -> jnp.ndarray:
    """The fixed 60-value beta schedule: 0.02 + explin(1e-5, 0.4, 60)."""
    return 0.02 + explin(1e-5, 0.4, n_steps)


def get_alpha_set(beta_set: jnp.ndarray | None = None) -> jnp.ndarray:
    """alpha_bar table: cumprod(1 - beta)."""
    if beta_set is None:
        beta_set = get_beta_set()
    return jnp.cumprod(1.0 - beta_set)


def strided_beta_set(
    n_steps: int, base: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Coarsened sub-schedule for fewer-step sampling (capability superset).

    Keeps n_steps alpha_bar levels of the canonical table (evenly spaced
    over schedule indices, both endpoints always included) and returns the
    beta table whose cumprod(1 - beta) reproduces those levels EXACTLY:

        beta_j = 1 - abar[s_j] / abar[s_{j-1}]      (abar[s_{-1}] = 1)

    i.e. each strided beta absorbs the product of the skipped per-step
    (1 - beta) factors — the standard strided-DDPM construction (Nichol &
    Dhariwal 2021, sec. 4). The result drops into any beta_set slot
    (diffusion_sample, _sample_jit): both step rules then walk the same
    trajectory endpoints in n_steps model calls instead of 60.

    n_steps == len(base) returns base unchanged (bit-identical identity).
    """
    if base is None:
        base = get_beta_set()
    n = base.shape[0]
    if not 2 <= n_steps <= n:
        raise ValueError(f"n_steps must be in [2, {n}], got {n_steps}")
    if n_steps == n:
        return base
    # Index selection on the host in float64: f32 jnp.linspace rounds
    # differently at some (n, n_steps) pairs (e.g. 59-of-60 flips index
    # 29 -> 30), and the kept-level choice should not depend on device
    # float quirks.
    import numpy as np

    idx = jnp.asarray(np.linspace(0, n - 1, n_steps).round().astype(np.int32))
    abar = get_alpha_set(base)[idx]
    prev = jnp.concatenate([jnp.ones((1,), abar.dtype), abar[:-1]])
    return 1.0 - abar / prev


def halve_beta_set(base: jnp.ndarray) -> jnp.ndarray:
    """One progressive-distillation halving of a beta table (superset).

    Construction (Salimans & Ho 2022, "Progressive Distillation for Fast
    Sampling of Diffusion Models"): take the EXTENDED level array
    L = [1.0, abar_0, ..., abar_{N-1}] (the N+1 alpha_bar levels a sampler
    actually visits, clean end included) and keep every second point —
    so one student step spans exactly two teacher steps, endpoints
    preserved. Requires even N. The returned table's cumprod(1 - beta)
    reproduces the kept levels exactly; betas absorb the skipped factors.

    Note this differs from strided_beta_set: striding keeps index-linspace
    levels of the CANONICAL table (right for zero-training fewer-step
    sampling), halving keeps the exact 2-for-1 alignment a distilled
    student was trained on (dhg/distill.py).
    """
    n = base.shape[0]
    if n % 2 != 0:
        raise ValueError(f"halving needs an even step count, got {n}")
    abar = get_alpha_set(base)
    levels = jnp.concatenate([jnp.ones((1,), abar.dtype), abar])[::2]
    return 1.0 - levels[1:] / levels[:-1]


def halved_beta_set(n_steps: int, base: jnp.ndarray | None = None) -> jnp.ndarray:
    """The beta table after halving `base` (default canonical 60) down to
    n_steps — the schedule a progressively-distilled student runs on.
    n_steps must be reachable by repeated halving (60 -> 30 -> 15)."""
    beta = get_beta_set() if base is None else base
    while beta.shape[0] > n_steps:
        if beta.shape[0] % 2 != 0:
            raise ValueError(
                f"{n_steps} steps is not reachable by halving from "
                f"{(base if base is not None else get_beta_set()).shape[0]} "
                f"(stuck at odd {beta.shape[0]})"
            )
        beta = halve_beta_set(beta)
    if beta.shape[0] != n_steps:
        raise ValueError(f"halving overshot: wanted {n_steps}, hit {beta.shape[0]}")
    return beta


def sample_alphas(key: jax.Array, batch_size: int, alpha_set: jnp.ndarray) -> jnp.ndarray:
    """Continuously sample alpha_bar values for a training batch.

    Picks a random adjacent pair (alpha_set[i], alpha_set[i+1]) per sample and
    draws uniformly between them. Returns shape [B, 1].
    """
    k_idx, k_u = jax.random.split(key)
    idx = jax.random.randint(k_idx, (batch_size, 1), 0, alpha_set.shape[0] - 1)
    lower = alpha_set[idx]
    upper = alpha_set[idx + 1]
    u = jax.random.uniform(k_u, (batch_size, 1))
    return u * (upper - lower) + lower

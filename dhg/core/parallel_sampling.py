"""Parallel-in-time DDIM sampling (Jacobi / Picard iteration) — superset.

The sequential sampler's 60 steps are data-dependent through x_t, so its
wall time is 60 small latency-bound model calls no matter how idle the
chip is (round-2 profile: 2-4% MFU, critical-path bound — PERFORMANCE.md).
This module trades those sequential steps for FLOPs the hardware has
spare: iterate the WHOLE trajectory as a fixed point (Shih et al. 2023,
"Parallel Sampling of Diffusion Models" — ParaDiGMS; here the plain
Jacobi variant without a sliding window, which keeps shapes static and
the program one jitted scan-of-sweeps).

Sequential DDIM defines states S_0 = x_T, S_{t+1} = F_t(S_t) with
    F_t(x) = ddim_step(x, eps(x, sigma_t), abar_t, abar_prev_t).
A Jacobi sweep updates every state from the previous iterate IN PARALLEL:
    S'_{t+1} = F_t(S_t)   for all t at once — ONE model call at batch
n*B instead of n calls at batch B. After sweep k, S_t is exact for
t <= k, so `sweeps = n` reproduces the sequential trajectory exactly
(pinned in tests/test_parallel_sampling.py); far fewer sweeps get within
any tolerance because information propagates through every step each
sweep, not one step per model call.

DDIM only (eta = 0): the fixed point is well-defined because the update
is deterministic. The stochastic rules would need pre-drawn per-step
noise held fixed across sweeps — mathematically fine, left for when a
use case appears.

Cost model (why this can win at small batch): a sweep costs one batch
n*B forward ~ the per-step cost of a batch-(n*B) sequential sampler;
sequential batch-B costs n latency-bound forwards. Parallel wins iff
sweeps_needed x step_cost(n*B) < n x step_cost(B) — i.e. exactly when
the chip is underutilized at batch B (the measured regime here at B=1).
Measured numbers: dhg/tools/eval_parallel_sampler.py + PERFORMANCE.md.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dhg.core.sampling import ddim_step
from dhg.core.schedule import get_alpha_set, get_beta_set


def parallel_ddim_sample(
    denoise_fn: Callable,
    key: jax.Array,
    batch_size: int,
    seq_len: int,
    beta_set: jnp.ndarray | None = None,
    sweeps: int | None = None,
    dtype=jnp.float32,
    return_all_sweeps: bool = False,
):
    """Sample by Jacobi iteration over the whole reverse trajectory.

    Args:
      denoise_fn: (x [M, T, 2], sigma [M, 1]) -> (eps [M, T, 2], pen [M, T])
        for ARBITRARY M — it is called at M = n_steps * batch_size (the
        caller closes text/style conditioning over it, tiled to that
        batch; dhg/tools/eval_parallel_sampler.py shows the pattern).
      key: PRNG key; x_T ~ N(0,1) comes from the same `split(key)[0]`
        stream as diffusion_sample, so same-key outputs are comparable.
      sweeps: Jacobi iterations. None = n_steps (exact, equal to the
        sequential DDIM trajectory); smaller trades accuracy for wall
        time — the approximation error for a given k is measured, not
        assumed (eval tool).
      return_all_sweeps: also return the final-state estimate after EVERY
        sweep [sweeps, B, T, 3] so convergence can be measured from one
        run.

    Returns:
      strokes [B, T, 3] ((dx, dy) + last-step pen probabilities), and the
      per-sweep estimates when return_all_sweeps.
    """
    if beta_set is None:
        beta_set = get_beta_set()
    beta_set = beta_set.astype(dtype)
    alpha_set = get_alpha_set(beta_set)
    n = beta_set.shape[0]
    if sweeps is None:
        sweeps = n

    # Same x_T stream as diffusion_sample (its k_init split).
    k_init, _ = jax.random.split(key)
    x_t = jax.random.normal(k_init, (batch_size, seq_len, 2), dtype=dtype)

    # Reverse schedule order, as in diffusion_sample: step t uses index
    # i = n-1-t. alpha_prev matches the DDIM rule's convention.
    idxs = jnp.arange(n - 1, -1, -1)
    alphas = alpha_set[idxs]  # [n]
    alpha_prevs = jnp.where(
        idxs > 0, alpha_set[jnp.maximum(idxs - 1, 0)], jnp.ones((), dtype)
    )
    sigmas = jnp.sqrt(alphas)  # [n]
    sig_rows = jnp.repeat(sigmas[:, None], batch_size, axis=1).reshape(-1, 1)  # [n*B,1]

    a = alphas[:, None, None, None]
    a_prev = alpha_prevs[:, None, None, None]

    # S[t] = state BEFORE step t; initialized to x_T everywhere (standard
    # Picard init). S[0] stays pinned to x_T.
    S = jnp.broadcast_to(x_t[None], (n, batch_size, seq_len, 2)).astype(dtype)

    def sweep(S, _):
        eps, pen = denoise_fn(S.reshape(n * batch_size, seq_len, 2), sig_rows)
        eps = eps.reshape(n, batch_size, seq_len, 2).astype(dtype)
        pen = pen.reshape(n, batch_size, seq_len)
        X_next = ddim_step(S, eps, a, a_prev)  # X_next[t] = F_t(S[t])
        S_new = jnp.concatenate([S[:1], X_next[:-1]], axis=0)
        # Final estimate this sweep: the post-state of the last step, with
        # its pen head (sequential parity: pen comes from the i == 0 step).
        est = jnp.concatenate([X_next[-1], pen[-1][..., None]], axis=-1)
        return S_new, est

    S, ests = jax.lax.scan(sweep, S, None, length=sweeps)
    out = ests[-1]
    if return_all_sweeps:
        return out, ests
    return out

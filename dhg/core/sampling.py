"""Reverse-diffusion samplers — pure step rules + a single-XLA-program sampler.

The entire 60-step reverse loop compiles to ONE jitted program via
``jax.lax.scan`` (vs. the reference's 60 separate model invocations in a
Python loop, inference.py:84-94). Step-rule parity:

  * standard_diffusion_step — DDPM ancestral step
        x_{t-1} = (1/sqrt(1-beta)) * (x - beta * eps_hat / sqrt(1-abar))
                  [+ sqrt(beta) * z   unless i == 0]
    (utils/nn.py:64-87; noise skipped at the last step, inference.py:92)

  * new_diffusion_step — the paper's variant
        x_{t-1} = (x - sqrt(1-abar) * eps_hat) / sqrt(1-beta)
                  + sqrt(1 - abar_next) * z
    with abar_next = alpha_set[i-1] for i > 1 else 1.0
    (utils/nn.py:90-112, inference.py:87)

  * ddim_step — capability superset (absent in the reference): the
    deterministic DDIM rule (Song et al. 2021, eta = 0)
        x0_hat   = (x - sqrt(1-abar) * eps_hat) / sqrt(abar)
        x_{t-1}  = sqrt(abar_prev) * x0_hat + sqrt(1-abar_prev) * eps_hat
    with abar_prev = alpha_set[i-1] for i > 0 else 1.0. No noise is
    injected after x_T, which is what makes DDIM the natural partner of
    the strided fewer-step schedule (generate(n_steps=k)): the update
    only needs the (abar, abar_prev) pair, so it is exact on any
    sub-schedule rather than approximating skipped ancestral steps.

The model is called with sigma = sqrt(abar_i) each step, and the pen-lift
probabilities from the LAST step (i == 0) are attached as channel 3
(inference.py:89-96).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dhg.core.schedule import get_alpha_set, get_beta_set


def standard_diffusion_step(
    xt: jnp.ndarray,
    eps_pred: jnp.ndarray,
    beta: jnp.ndarray,
    alpha: jnp.ndarray,
    noise: jnp.ndarray,
    add_sigma,
) -> jnp.ndarray:
    """DDPM ancestral step. `noise` is pre-drawn N(0,1); `add_sigma` gates it."""
    x_prev = (1.0 / jnp.sqrt(1.0 - beta)) * (xt - beta * eps_pred / jnp.sqrt(1.0 - alpha))
    return x_prev + jnp.where(add_sigma, jnp.sqrt(beta), 0.0) * noise


def new_diffusion_step(
    xt: jnp.ndarray,
    eps_pred: jnp.ndarray,
    beta: jnp.ndarray,
    alpha: jnp.ndarray,
    alpha_next: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """The paper's alternative step rule."""
    x_prev = (xt - jnp.sqrt(1.0 - alpha) * eps_pred) / jnp.sqrt(1.0 - beta)
    return x_prev + noise * jnp.sqrt(1.0 - alpha_next)


def ddim_step(
    xt: jnp.ndarray,
    eps_pred: jnp.ndarray,
    alpha: jnp.ndarray,
    alpha_prev: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic DDIM update (Song et al. 2021, eta = 0).

    alpha/alpha_prev are alpha_bar at the current and previous schedule
    index (alpha_prev = 1 at the final step, which collapses the update
    to the model's clean-sample estimate x0_hat)."""
    x0_hat = (xt - jnp.sqrt(1.0 - alpha) * eps_pred) / jnp.sqrt(alpha)
    return jnp.sqrt(alpha_prev) * x0_hat + jnp.sqrt(1.0 - alpha_prev) * eps_pred


def infer_seq_len(num_tokens: int) -> int:
    """Sequence length heuristic: 16 per token, bumped to the next multiple of 8.

    Matches inference.py:77-78 exactly: T = 16*L; T = T - T % 8 + 8 — i.e.
    strictly rounds UP past the nearest multiple of 8 (adds 8 even when
    already divisible).
    """
    t = 16 * num_tokens
    return t - (t % 8) + 8


def per_sample_noise_streams(
    sample_keys: jax.Array, n_steps: int, seq_len: int, dtype=jnp.float32
):
    """Independent per-sample noise streams for batched sampling.

    sample_keys: [B] PRNG keys (one per request/sample). Each sample's
    initial x0 and per-step noise derive ONLY from its own key, so a
    request keyed PRNGKey(seed) draws identical noise whether it runs
    alone or co-batched with others (the serving batcher's determinism
    contract). For B=1 this reproduces diffusion_sample's single-key
    draws bit-for-bit (jax.random.normal streams depend on element count,
    not shape).

    Returns (x0 [B, T, 2], step_keys [n_steps, B]).
    """

    def one(k):
        k_init, k_steps = jax.random.split(k)
        x0 = jax.random.normal(k_init, (seq_len, 2), dtype=dtype)
        return x0, jax.random.split(k_steps, n_steps)

    x0, steps = jax.vmap(one)(sample_keys)
    return x0, jnp.swapaxes(steps, 0, 1)


def diffusion_sample(
    denoise_fn: Callable,
    key: jax.Array,
    batch_size: int,
    seq_len: int,
    beta_set: jnp.ndarray | None = None,
    mode: str = "new",
    dtype=jnp.float32,
    step_ctx=None,
    sample_keys: jax.Array | None = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Run the full reverse-diffusion loop as one lax.scan.

    Args:
      denoise_fn: (x [B,T,2], sigma [B,1]) -> (eps_pred [B,T,2], pen [B,T]).
        Text/style conditioning should be closed over — OR precomputed per
        step and passed via step_ctx (below), which keeps the conditioning
        encoder entirely outside the scan.
      key: PRNG key. The initial x ~ N(0,1) and all per-step noise come
        from deterministic splits of this key.
      batch_size, seq_len: output shape (seq_len must be a multiple of 8).
      beta_set: noise schedule (defaults to the canonical 60-step table).
      mode: "new" (default, the paper's rule) or "standard" (DDPM ancestral).
      step_ctx: optional pytree with leading dim n_steps, scanned in REVERSE
        schedule order (entry t corresponds to schedule index n-1-t). When
        given, denoise_fn is called as denoise_fn(x, sigma, ctx_t).
      sample_keys: optional [B] per-sample keys replacing `key` — each
        batch row gets its own independent noise stream (see
        per_sample_noise_streams). Used by the serving batcher.
      temperature: sampling temperature (capability superset; the
        reference always samples at 1.0). Scales the initial x_T AND all
        injected per-step noise by the factor — < 1 trades diversity for
        neater, lower-variance handwriting (the diffusion analogue of
        Graves-style RNN sampling bias), > 1 the reverse. Applied at
        trace time: 1.0 compiles the exact default program.

    Returns:
      strokes [B, T, 3]: (dx, dy) from the final x plus the last step's
      pen-lift probabilities as channel 3.
    """
    if beta_set is None:
        beta_set = get_beta_set()
    beta_set = beta_set.astype(dtype)
    alpha_set = get_alpha_set(beta_set)
    n = beta_set.shape[0]

    # Per-step noise is drawn OUTSIDE the scan in one batched pass (bit-
    # identical to in-loop draws: same keys, same element counts — only the
    # schedule changes; keeps threefry out of the hot loop).
    if sample_keys is not None:
        x0, step_keys = per_sample_noise_streams(sample_keys, n, seq_len, dtype)
        noises = jax.vmap(
            jax.vmap(lambda kk: jax.random.normal(kk, (seq_len, 2), dtype))
        )(step_keys)
    else:
        k_init, k_steps = jax.random.split(key)
        x0 = jax.random.normal(k_init, (batch_size, seq_len, 2), dtype=dtype)
        step_keys = jax.random.split(k_steps, n)
        noises = jax.vmap(
            lambda kk: jax.random.normal(kk, (batch_size, seq_len, 2), dtype)
        )(step_keys)

    if temperature != 1.0:  # trace-time: 1.0 keeps the default program exact
        x0 = x0 * jnp.asarray(temperature, dtype)
        noises = noises * jnp.asarray(temperature, dtype)

    # Scan runs t = 0..n-1 over reversed schedule index i = n-1-t.
    idxs = jnp.arange(n - 1, -1, -1)
    # abar_next[i] = alpha_set[i-1] if i > 1 else 1.0  (inference.py:87)
    alpha_next_set = jnp.where(
        idxs > 1, alpha_set[jnp.maximum(idxs - 1, 0)], jnp.ones((), dtype)
    )
    # abar_prev[i] = alpha_set[i-1] if i > 0 else 1.0 (the mathematically
    # exact previous level, used by the DDIM rule — note the reference's
    # "new" rule quirk above treats i == 1 as 1.0 as well).
    alpha_prev_set = jnp.where(
        idxs > 0, alpha_set[jnp.maximum(idxs - 1, 0)], jnp.ones((), dtype)
    )

    def body(x, per_step):
        i, alpha_next, alpha_prev, noise, ctx = per_step
        alpha = alpha_set[i]
        beta = beta_set[i]
        sigma = jnp.sqrt(alpha) * jnp.ones((batch_size, 1), dtype)
        if step_ctx is None:
            eps_pred, pen = denoise_fn(x, sigma)
        else:
            eps_pred, pen = denoise_fn(x, sigma, ctx)
        if mode == "standard":
            x_next = standard_diffusion_step(x, eps_pred, beta, alpha, noise, i > 0)
        elif mode == "ddim":
            x_next = ddim_step(x, eps_pred, alpha, alpha_prev)
        else:
            x_next = new_diffusion_step(x, eps_pred, beta, alpha, alpha_next, noise)
        # eps_pred is f32 (model heads); keep the carry dtype stable.
        return x_next.astype(dtype), pen

    xs = (idxs, alpha_next_set, alpha_prev_set, noises, step_ctx)
    # DHG_SCAN_UNROLL > 1 unrolls the scan body (numerically identical —
    # same ops in the same data-dependency order; only XLA's scheduling
    # window widens across adjacent steps, e.g. step t+1's weight/ctx
    # prefetches can overlap step t compute). NOTE: read at TRACE time,
    # not part of the jit cache key — A/B across fresh processes.
    import os

    unroll = int(os.environ.get("DHG_SCAN_UNROLL", "1"))
    x_final, pens = jax.lax.scan(body, x0, xs, unroll=unroll)
    return jnp.concatenate([x_final, pens[-1][..., None]], axis=-1)


def diffusion_sample_encoder_reuse(
    encode_fn: Callable,
    decode_fn: Callable,
    key: jax.Array,
    batch_size: int,
    seq_len: int,
    step_ctx,
    beta_set: jnp.ndarray | None = None,
    mode: str = "new",
    reuse_every: int = 1,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sampler with U-Net encoder-feature caching (experimental speed mode).

    Per Li et al., "Faster Diffusion" (arXiv:2312.09608), U-Net encoder
    features vary slowly across adjacent diffusion steps. Here the encoder
    half runs only every `reuse_every` steps; in between, the cached
    (h1, h2, h3) skip features are decoded against the fresh x_t-independent
    conditioning. reuse_every=1 is exact (identical math to
    diffusion_sample); larger values trade fidelity for speed.

    QUALITY WARNING (measured round 2, PERFORMANCE.md): on trained weights
    reuse_every=2 drifts to 3x the 1e-3 stroke-MSE parity bar and
    reuse_every>=3 diverges numerically (MSE > 1e6). No recommended
    setting exists; this stays an experimental research knob.

    encode_fn(x, ctx) -> feats pytree; decode_fn(feats, ctx) -> (eps, pen).
    step_ctx follows diffusion_sample's reverse-order convention.
    """
    if beta_set is None:
        beta_set = get_beta_set()
    beta_set = beta_set.astype(dtype)
    alpha_set = get_alpha_set(beta_set)
    n = beta_set.shape[0]

    k_init, k_steps = jax.random.split(key)
    x0 = jax.random.normal(k_init, (batch_size, seq_len, 2), dtype=dtype)
    step_keys = jax.random.split(k_steps, n)
    noises = jax.vmap(
        lambda kk: jax.random.normal(kk, (batch_size, seq_len, 2), dtype)
    )(step_keys)

    idxs = jnp.arange(n - 1, -1, -1)
    alpha_next_set = jnp.where(
        idxs > 1, alpha_set[jnp.maximum(idxs - 1, 0)], jnp.ones((), dtype)
    )
    alpha_prev_set = jnp.where(
        idxs > 0, alpha_set[jnp.maximum(idxs - 1, 0)], jnp.ones((), dtype)
    )
    ts = jnp.arange(n)

    ctx0 = jax.tree.map(lambda a: a[0], step_ctx)
    feat_shapes = jax.eval_shape(encode_fn, x0, ctx0)
    feats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feat_shapes)

    def body(carry, per_step):
        x, feats = carry
        t, i, alpha_next, alpha_prev, noise, ctx = per_step
        alpha = alpha_set[i]
        beta = beta_set[i]

        feats = jax.lax.cond(
            t % reuse_every == 0,
            lambda: encode_fn(x, ctx),
            lambda: feats,
        )
        eps_pred, pen = decode_fn(feats, ctx)
        if mode == "standard":
            x_next = standard_diffusion_step(x, eps_pred, beta, alpha, noise, i > 0)
        elif mode == "ddim":
            x_next = ddim_step(x, eps_pred, alpha, alpha_prev)
        else:
            x_next = new_diffusion_step(x, eps_pred, beta, alpha, alpha_next, noise)
        # eps_pred is f32 (model heads); keep the carry dtype stable.
        return (x_next.astype(dtype), feats), pen

    (x_final, _), pens = jax.lax.scan(
        body, (x0, feats0), (ts, idxs, alpha_next_set, alpha_prev_set, noises, step_ctx)
    )
    return jnp.concatenate([x_final, pens[-1][..., None]], axis=-1)

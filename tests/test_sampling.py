"""Sampler tests: step rules vs hand math, determinism, seq-len heuristic."""

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.sampling import (
    ddim_step,
    diffusion_sample,
    infer_seq_len,
    new_diffusion_step,
    standard_diffusion_step,
)


def test_infer_seq_len():
    # 16*L bumped past the next multiple of 8 (reference inference.py:77-78).
    assert infer_seq_len(24) == 392
    assert infer_seq_len(10) == 168
    assert infer_seq_len(1) == 24
    for n in range(1, 60):
        t = infer_seq_len(n)
        assert t % 8 == 0 and t > 16 * n - 8


def test_standard_step_math():
    xt = jnp.ones((1, 4, 2))
    eps = jnp.full((1, 4, 2), 0.5)
    beta, alpha = jnp.float32(0.1), jnp.float32(0.6)
    noise = jnp.full((1, 4, 2), 2.0)
    out = standard_diffusion_step(xt, eps, beta, alpha, noise, True)
    expected = (1 / np.sqrt(0.9)) * (1 - 0.1 * 0.5 / np.sqrt(0.4)) + np.sqrt(0.1) * 2.0
    assert np.allclose(np.asarray(out), expected, rtol=1e-6)
    out0 = standard_diffusion_step(xt, eps, beta, alpha, noise, False)
    expected0 = (1 / np.sqrt(0.9)) * (1 - 0.1 * 0.5 / np.sqrt(0.4))
    assert np.allclose(np.asarray(out0), expected0, rtol=1e-6)


def test_new_step_math():
    xt = jnp.ones((1, 4, 2))
    eps = jnp.full((1, 4, 2), 0.5)
    beta, alpha, a_next = jnp.float32(0.1), jnp.float32(0.6), jnp.float32(0.8)
    noise = jnp.full((1, 4, 2), 1.0)
    out = new_diffusion_step(xt, eps, beta, alpha, a_next, noise)
    expected = (1 - np.sqrt(0.4) * 0.5) / np.sqrt(0.9) + np.sqrt(0.2)
    assert np.allclose(np.asarray(out), expected, rtol=1e-6)


def test_ddim_step_math():
    xt = jnp.ones((1, 4, 2))
    eps = jnp.full((1, 4, 2), 0.5)
    alpha, a_prev = jnp.float32(0.6), jnp.float32(0.8)
    out = ddim_step(xt, eps, alpha, a_prev)
    x0_hat = (1 - np.sqrt(0.4) * 0.5) / np.sqrt(0.6)
    expected = np.sqrt(0.8) * x0_hat + np.sqrt(0.2) * 0.5
    assert np.allclose(np.asarray(out), expected, rtol=1e-6)
    # At the final step (abar_prev = 1) the update IS the x0 estimate.
    out_final = ddim_step(xt, eps, alpha, jnp.float32(1.0))
    assert np.allclose(np.asarray(out_final), x0_hat, rtol=1e-6)


def test_ddim_ignores_step_noise():
    """DDIM (eta=0) injects no noise after x_T: with a denoiser whose
    prediction depends only on x, the trajectory from a fixed x0 is a
    deterministic function — and with eps_hat = 0 it telescopes to the
    closed form x_final = x0 / sqrt(alpha_bar_T)."""
    from dhg.core.schedule import get_alpha_set

    zero_eps = lambda x, sigma: (jnp.zeros_like(x), jnp.zeros(x.shape[:2]))
    key = jax.random.PRNGKey(5)
    out = diffusion_sample(zero_eps, key, 2, 24, mode="ddim")
    x0 = jax.random.normal(jax.random.split(key)[0], (2, 24, 2))
    expected = np.asarray(x0) / np.sqrt(np.asarray(get_alpha_set())[-1])
    np.testing.assert_allclose(
        np.asarray(out[..., :2]), expected, rtol=2e-4, atol=1e-3
    )


def test_ddim_exact_on_strided_schedule():
    """The DDIM update only consumes (abar_i, abar_prev) pairs, so with a
    denoiser that depends only on x (not sigma), running it on the strided
    sub-schedule visits the SAME x values the 60-step DDIM trajectory has
    at the kept levels — exact in exact arithmetic whenever eps_hat is
    level-independent (here: eps_hat = 0 again, where both telescope to
    x0 / sqrt(abar_T))."""
    from dhg.core.schedule import get_alpha_set, strided_beta_set

    zero_eps = lambda x, sigma: (jnp.zeros_like(x), jnp.zeros(x.shape[:2]))
    key = jax.random.PRNGKey(9)
    full = np.asarray(diffusion_sample(zero_eps, key, 1, 24, mode="ddim"))
    strided = np.asarray(
        diffusion_sample(
            zero_eps, key, 1, 24, beta_set=strided_beta_set(10), mode="ddim"
        )
    )
    np.testing.assert_allclose(strided[..., :2], full[..., :2], rtol=2e-4, atol=1e-3)


def test_ddim_mode_differs_from_others():
    key = jax.random.PRNGKey(0)
    a = diffusion_sample(_dummy_denoiser, key, 1, 24, mode="ddim")
    b = diffusion_sample(_dummy_denoiser, key, 1, 24, mode="new")
    c = diffusion_sample(_dummy_denoiser, key, 1, 24, mode="standard")
    assert not np.allclose(np.asarray(a[..., :2]), np.asarray(b[..., :2]))
    assert not np.allclose(np.asarray(a[..., :2]), np.asarray(c[..., :2]))
    assert np.all(np.isfinite(np.asarray(a)))


def _dummy_denoiser(x, sigma):
    # Pretend the noise is half the current sample; pen = sigmoid-ish const.
    return x * 0.5, jnp.full(x.shape[:2], 0.3)


def test_sample_shapes_and_determinism():
    key = jax.random.PRNGKey(42)
    out1 = diffusion_sample(_dummy_denoiser, key, 2, 48)
    out2 = diffusion_sample(_dummy_denoiser, key, 2, 48)
    assert out1.shape == (2, 48, 3)
    assert np.allclose(np.asarray(out1), np.asarray(out2))
    # Pen channel comes from the final step's pen head.
    assert np.allclose(np.asarray(out1[..., 2]), 0.3)
    out3 = diffusion_sample(_dummy_denoiser, jax.random.PRNGKey(7), 2, 48)
    assert not np.allclose(np.asarray(out1[..., :2]), np.asarray(out3[..., :2]))


def test_sample_modes_differ():
    key = jax.random.PRNGKey(0)
    a = diffusion_sample(_dummy_denoiser, key, 1, 24, mode="new")
    b = diffusion_sample(_dummy_denoiser, key, 1, 24, mode="standard")
    assert not np.allclose(np.asarray(a[..., :2]), np.asarray(b[..., :2]))


def test_sample_under_jit():
    f = jax.jit(lambda k: diffusion_sample(_dummy_denoiser, k, 1, 24))
    out = f(jax.random.PRNGKey(0))
    assert out.shape == (1, 24, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_temperature_one_is_bit_identical():
    key = jax.random.PRNGKey(5)
    a = diffusion_sample(_dummy_denoiser, key, 2, 48)
    b = diffusion_sample(_dummy_denoiser, key, 2, 48, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_temperature_scales_stochastic_trajectory_linearly():
    """With the linear dummy denoiser (eps_hat = x/2) every sampler update
    is linear in (x, noise), so scaling both x_T and the injected noise by
    tau scales the whole trajectory by exactly tau."""
    key = jax.random.PRNGKey(6)
    for mode in ("new", "standard", "ddim"):
        full = np.asarray(diffusion_sample(_dummy_denoiser, key, 1, 24, mode=mode)[..., :2])
        cool = np.asarray(
            diffusion_sample(_dummy_denoiser, key, 1, 24, mode=mode, temperature=0.5)[..., :2]
        )
        np.testing.assert_allclose(cool, 0.5 * full, rtol=1e-5, atol=1e-6), mode


def test_temperature_reduces_output_spread():
    key = jax.random.PRNGKey(7)
    hot = np.asarray(diffusion_sample(_dummy_denoiser, key, 4, 48, temperature=1.5)[..., :2])
    cold = np.asarray(diffusion_sample(_dummy_denoiser, key, 4, 48, temperature=0.3)[..., :2])
    assert cold.std() < hot.std()


def test_per_sample_keys_match_single_key_at_b1():
    """sample_keys=[PRNGKey(s)] at B=1 reproduces key=PRNGKey(s) exactly
    (jax.random streams depend on element count, not shape) — the serving
    batcher's per-request determinism anchor."""
    from dhg.core.sampling import diffusion_sample

    def denoise_fn(x, sigma):
        return -x * sigma[..., None], jnp.zeros(x.shape[:-1])

    k = jax.random.PRNGKey(123)
    a = diffusion_sample(denoise_fn, k, batch_size=1, seq_len=24)
    b = diffusion_sample(
        denoise_fn, None, batch_size=1, seq_len=24, sample_keys=jnp.stack([k])
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_sample_keys_row_independent_of_batch_composition():
    """A row keyed PRNGKey(s) draws the same noise regardless of which other
    rows share the batch (per-request streams)."""
    from dhg.core.sampling import diffusion_sample

    def denoise_fn(x, sigma):
        # Row-local denoiser: no cross-batch mixing, so rows must be equal
        # bit-for-bit across batch compositions.
        return -x * sigma[..., None], jnp.zeros(x.shape[:-1])

    k1, k2, k3 = (jax.random.PRNGKey(i) for i in (1, 2, 3))
    a = diffusion_sample(
        denoise_fn, None, batch_size=2, seq_len=24, sample_keys=jnp.stack([k1, k2])
    )
    b = diffusion_sample(
        denoise_fn, None, batch_size=2, seq_len=24, sample_keys=jnp.stack([k1, k3])
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

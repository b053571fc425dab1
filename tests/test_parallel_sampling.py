"""Parallel-in-time (Jacobi) DDIM sampler vs the sequential scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.core.parallel_sampling import parallel_ddim_sample
from dhg.core.sampling import diffusion_sample
from dhg.core.schedule import strided_beta_set
from dhg.models.denoiser import DiffusionModel


@pytest.fixture(scope="module")
def setup():
    b, t, l = 2, 24, 8
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 73, size=(b, l)), jnp.int32)
    style = jnp.asarray(rng.randn(b, 14, 1280), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, 2)), text[:1], jnp.ones((1, 1)), style[:1]
    )["params"]

    def denoise_b(x, sigma):  # sequential path: batch b
        return model.apply({"params": params}, x, text, sigma, style)

    def denoise_any(x, sigma):  # parallel path: batch n*b (conditioning tiled)
        reps = x.shape[0] // b
        return model.apply(
            {"params": params},
            x,
            jnp.tile(text, (reps, 1)),
            sigma,
            jnp.tile(style, (reps, 1, 1)),
        )

    return b, t, denoise_b, denoise_any


def test_full_sweeps_match_sequential_ddim(setup):
    """sweeps = n reproduces the sequential DDIM trajectory (same key)."""
    b, t, denoise_b, denoise_any = setup
    beta = strided_beta_set(6)
    key = jax.random.PRNGKey(7)

    seq = np.asarray(
        diffusion_sample(denoise_b, key, batch_size=b, seq_len=t, beta_set=beta, mode="ddim")
    )
    par = np.asarray(
        parallel_ddim_sample(denoise_any, key, batch_size=b, seq_len=t, beta_set=beta)
    )
    # Same math; the batched-over-steps matmuls may tile differently -> tiny
    # f32 drift, far under the repo's 1e-3 parity bar.
    np.testing.assert_allclose(par, seq, rtol=1e-4, atol=2e-5)


def test_convergence_improves_with_sweeps(setup):
    """Fewer sweeps approximate; error to the fixed point shrinks with k."""
    b, t, denoise_b, denoise_any = setup
    beta = strided_beta_set(8)
    key = jax.random.PRNGKey(3)

    seq = np.asarray(
        diffusion_sample(denoise_b, key, batch_size=b, seq_len=t, beta_set=beta, mode="ddim")
    )
    _, ests = parallel_ddim_sample(
        denoise_any, key, batch_size=b, seq_len=t, beta_set=beta, return_all_sweeps=True
    )
    errs = [float(np.mean((np.asarray(e)[..., :2] - seq[..., :2]) ** 2)) for e in ests]
    assert errs[-1] <= 2e-9  # sweep n: exact up to f32 tiling drift
    assert errs[2] < errs[0]  # information propagates across sweeps
    assert errs[-1] <= min(errs) + 1e-12  # the last sweep is the best


def test_jitted_and_key_stream_matches_sequential_init(setup):
    """The whole sampler jits as one program, and its x_T comes from the
    same split(key)[0] stream as diffusion_sample (comparable same-key runs)."""
    b, t, _, denoise_any = setup
    beta = strided_beta_set(4)
    key = jax.random.PRNGKey(11)

    jitted = jax.jit(
        lambda k: parallel_ddim_sample(
            denoise_any, k, batch_size=b, seq_len=t, beta_set=beta, sweeps=2
        )
    )
    out = np.asarray(jitted(key))
    assert out.shape == (b, t, 3)
    assert np.all(np.isfinite(out))
    # pen channel is a sigmoid output
    assert out[..., 2].min() >= 0.0 and out[..., 2].max() <= 1.0

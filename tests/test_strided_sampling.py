"""Fewer-step sampling via schedule striding (capability superset).

strided_beta_set builds a coarsened beta table whose cumprod(1 - beta)
hits a subset of the canonical 60 alpha_bar levels exactly (strided DDPM,
Nichol & Dhariwal 2021 sec. 4); generate(n_steps=k) runs the unchanged
step rules over it. These tests pin the schedule algebra and the sampler
plumbing; fidelity vs the 60-step trajectory is a measured property of a
trained checkpoint (PERFORMANCE.md "Fewer-step sampling"), not a unit
invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhg.core.schedule import get_alpha_set, get_beta_set, strided_beta_set
from dhg.inference import generate
from dhg.models.denoiser import DiffusionModel


def test_full_length_stride_is_identity():
    base = get_beta_set()
    np.testing.assert_array_equal(
        np.asarray(strided_beta_set(60, base)), np.asarray(base)
    )


@pytest.mark.parametrize("k", [2, 15, 30, 59])
def test_strided_alphas_hit_base_levels_exactly(k):
    base = get_beta_set()
    alpha = np.asarray(get_alpha_set(base))
    strided = strided_beta_set(k, base)
    got = np.asarray(get_alpha_set(strided))
    idx = np.linspace(0, 59, k).round().astype(int)
    # Both endpoints always kept; levels match up to the cumprod/division
    # round-trip's f32 roundoff.
    assert idx[0] == 0 and idx[-1] == 59
    np.testing.assert_allclose(got, alpha[idx], rtol=5e-6)
    betas = np.asarray(strided)
    assert betas.shape == (k,)
    assert np.all(betas > 0) and np.all(betas < 1)


def test_strided_bounds_rejected():
    with pytest.raises(ValueError):
        strided_beta_set(1)
    with pytest.raises(ValueError):
        strided_beta_set(61)


@pytest.fixture(scope="module")
def tiny():
    model = DiffusionModel(num_layers=2, c1=32, c2=48, c3=64)
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 1280))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        text[:1],
        jnp.ones((1, 1)),
        style[:1],
    )["params"]
    return model, params, text, style


@pytest.mark.parametrize("mode", ["new", "standard", "ddim"])
def test_generate_n_steps_shape_and_determinism(tiny, mode):
    model, params, text, style = tiny
    key = jax.random.PRNGKey(7)
    a = generate(
        model, params, text, style, key, seq_len=24, diffusion_mode=mode, n_steps=15
    )
    b = generate(
        model, params, text, style, key, seq_len=24, diffusion_mode=mode, n_steps=15
    )
    assert a.shape == (2, 24, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_n_steps_60_matches_default_bitwise(tiny):
    model, params, text, style = tiny
    key = jax.random.PRNGKey(3)
    full = generate(model, params, text, style, key, seq_len=24)
    sixty = generate(model, params, text, style, key, seq_len=24, n_steps=60)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(sixty))


def test_guidance_composes_with_ddim_and_n_steps(tiny):
    """guidance_scale wraps the denoiser BEFORE the step-rule dispatch
    (inference.py::_sample_jit), so CFG composes with both the ddim rule
    and the strided schedule: the guided run is deterministic and genuinely
    different from the unguided one."""
    model, params, text, style = tiny
    key = jax.random.PRNGKey(13)
    kw = dict(seq_len=24, diffusion_mode="ddim", n_steps=15)
    guided = generate(
        model, params, text, style, key, guidance_scale=2.0, **kw
    )
    guided2 = generate(
        model, params, text, style, key, guidance_scale=2.0, **kw
    )
    unguided = generate(model, params, text, style, key, **kw)
    np.testing.assert_array_equal(np.asarray(guided), np.asarray(guided2))
    assert not np.allclose(
        np.asarray(guided[..., :2]), np.asarray(unguided[..., :2])
    )
    assert np.all(np.isfinite(np.asarray(guided)))


def test_strided_tracks_full_on_tiny_model(tiny):
    """30-step output stays in the same ballpark as the 60-step one.

    Even untrained, both trajectories share endpoints and noise scale, so
    the strided result must be finite and not orders of magnitude apart —
    a plumbing check (wrong beta algebra blows up by step 2), not a
    quality claim.
    """
    model, params, text, style = tiny
    key = jax.random.PRNGKey(11)
    full = np.asarray(generate(model, params, text, style, key, seq_len=24))
    half = np.asarray(
        generate(model, params, text, style, key, seq_len=24, n_steps=30)
    )
    assert np.all(np.isfinite(half))
    assert np.abs(half[..., :2]).max() < 10 * max(np.abs(full[..., :2]).max(), 1.0)


def test_device_beta_set_is_cached():
    """Round-5 fix: fewer-step sampling must NOT rebuild + re-upload the
    coarsened beta table per call — on the axon tunnel the per-call H2D
    measured 123.5 ms/call chained vs 6.5 ms device-resident (batch-1
    15-step DDIM). The device table is built once per (n_steps, schedule)."""
    from dhg.inference import _device_beta_set

    a = _device_beta_set(15, "halved")
    b = _device_beta_set(15, "halved")
    assert a is b  # same committed device array, no re-upload
    assert a.shape == (15,)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown schedule"):
        _device_beta_set(15, "bogus")

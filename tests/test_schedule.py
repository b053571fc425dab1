"""Schedule math vs hand-computed values (reference utils/nn.py:19-61)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.schedule import explin, get_alpha_set, get_beta_set, sample_alphas


def test_explin_endpoints():
    v = np.asarray(explin(1e-5, 0.4, 60))
    assert math.isclose(v[0], 1e-5, rel_tol=1e-4)
    assert math.isclose(v[-1], 0.4, rel_tol=1e-4)
    assert np.all(np.diff(v) > 0)


def test_beta_set_values():
    beta = np.asarray(get_beta_set())
    assert beta.shape == (60,)
    assert math.isclose(beta[0], 0.02 + 1e-5, rel_tol=1e-4)
    assert math.isclose(beta[-1], 0.42, rel_tol=1e-4)
    # Exponential spacing in log-domain of (beta - 0.02).
    logs = np.log(beta - 0.02)
    diffs = np.diff(logs)
    # f32 cancellation near beta[0]-0.02 = 1e-5 leaves ~1e-3 log noise.
    assert np.allclose(diffs, diffs[0], atol=5e-3)


def test_alpha_set_is_cumprod():
    beta = get_beta_set()
    alpha = np.asarray(get_alpha_set(beta))
    assert np.allclose(alpha, np.cumprod(1 - np.asarray(beta)), rtol=1e-6)
    assert alpha[0] > alpha[-1] > 0


def test_sample_alphas_in_range():
    alpha_set = get_alpha_set()
    a = sample_alphas(jax.random.PRNGKey(0), 512, alpha_set)
    assert a.shape == (512, 1)
    arr = np.asarray(a)
    # alpha_set is decreasing, so samples live in [min, max] of the table.
    assert arr.min() >= float(jnp.min(alpha_set)) - 1e-6
    assert arr.max() <= float(jnp.max(alpha_set)) + 1e-6

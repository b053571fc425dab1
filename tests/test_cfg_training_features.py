"""cond_dropout training knob + mesh-sharded generate + bf16 carry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.config import DLConfig, fit_config
from dhg.inference import generate
from dhg.models.denoiser import DiffusionModel
from dhg.parallel.mesh import make_mesh
from dhg.train import Trainer


def _cfg(**overrides):
    base = {
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 4,
        "training_args.max_files": 8,
        "training_args.compute_dtype": "float32",
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    }
    base.update(overrides)
    return DLConfig(fit_config(config="smoke.yml", **base))


def test_cond_dropout_step_runs_and_changes_rng_path():
    t0 = Trainer(_cfg())
    t1 = Trainer(_cfg(**{"training_args.cond_dropout": 0.5}))
    d0, d1 = t0.load_dataset(), t1.load_dataset()
    s0, s1 = t0.init_state(0), t1.init_state(0)
    k = jax.random.PRNGKey(0)
    m0 = np.asarray(t0.make_step_fn(d0)(s0, k)[1])
    m1 = np.asarray(t1.make_step_fn(d1)(s1, k)[1])
    assert np.all(np.isfinite(m0)) and np.all(np.isfinite(m1))
    # Same data/seed, but dropped conditioning changes the loss.
    assert not np.allclose(m0, m1)


@pytest.fixture(scope="module")
def small():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    text = jnp.zeros((8, 20), jnp.int32).at[:, :4].set(5).at[:, 4].set(1)
    style = jax.random.normal(jax.random.PRNGKey(2), (8, 14, 1280))
    return model, params, text, style


def test_generate_over_mesh_matches_single_device(small, eight_devices):
    model, params, text, style = small
    k = jax.random.PRNGKey(1)
    single = generate(model, params, text, style, k, seq_len=24)
    mesh = make_mesh()  # (8, 1)
    sharded = generate(model, params, text, style, k, seq_len=24, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-4, atol=2e-4
    )


# NOTE: a bf16 scan-carry option was evaluated and REJECTED: measured slower
# than f32 carry on TPU (22.8k vs 26.5k steps/s) and jax.random draws differ
# by dtype, so the whole trajectory diverges rather than rounding. See
# DEVNOTES.md "Round-2 candidates".

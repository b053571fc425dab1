"""Training extras: clip modes, checkpoint resume, batched varied-length sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer, clip_transform


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


@pytest.mark.parametrize("mode", ["norm", "value", "agc"])
def test_clip_modes_build_and_clip(mode):
    tx = clip_transform(1.0, mode)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 100.0)}
    out, _ = tx.update(grads, state, params)
    assert float(jnp.abs(out["w"]).max()) < 100.0


def test_clip_mode_unknown_raises():
    with pytest.raises(KeyError):
        clip_transform(1.0, "bogus")


def test_resume_roundtrip(tmp_path):
    from dhg.checkpoint import save_checkpoint

    t = Trainer(_cfg())
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    for i in range(3):
        state, _ = step(state, jax.random.fold_in(jax.random.PRNGKey(0), i))

    save_checkpoint(tmp_path / "checkpoint_3", state.params, opt_state=state.opt_state, step=3)
    leaf_before = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    t2 = Trainer(_cfg())
    fresh = t2.init_state(0)
    resumed, start = t2.resume_state(fresh, tmp_path / "checkpoint_3")
    assert start == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(resumed.params)[0]), leaf_before, rtol=1e-6
    )
    # Resumed state steps fine.
    step2 = t2.make_step_fn(t2.load_dataset())
    resumed, metrics = step2(resumed, jax.random.PRNGKey(9))
    assert np.all(np.isfinite(np.asarray(metrics)))


def test_sample_lines_varied_lengths():
    from dhg.inference import sample_lines
    from dhg.models.denoiser import DiffusionModel

    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]

    prompts = ["hi", "hello there"]
    style = jnp.zeros((1, 14, 1280))
    outs = sample_lines(model, params, prompts, style, jax.random.PRNGKey(1), max_text_len=20)
    assert len(outs) == 2
    # Each trimmed to its own 16*(len+EOS) heuristic bucket.
    assert outs[0].shape == (16 * 3 - (16 * 3) % 8 + 8, 3)
    assert outs[1].shape == (16 * 12 - (16 * 12) % 8 + 8, 3)
    for o in outs:
        assert np.all(np.isfinite(o))

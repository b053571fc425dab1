"""Training runtime: schedule parity, one fused step, overfit-one-batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer, make_optimizer, noam_schedule


def _smoke_cfg(**overrides):
    raw = fit_config(config="smoke.yml", **overrides)
    return DLConfig(raw)


def test_noam_schedule_matches_reference_formula():
    d_model, warmup = 256, 10000
    sched = noam_schedule(d_model, warmup)
    for n in [1, 100, 10000, 60000]:
        expected = d_model**-0.5 * min(n**-0.5, n * warmup**-1.5)
        got = float(sched(n - 1))  # optax count is 0-based; torch starts at 1
        assert np.isclose(got, expected, rtol=1e-6), n


def test_optimizer_builds_and_updates():
    cfg = _smoke_cfg()
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    updates, _ = tx.update(grads, state, params)
    # First step: lr = 256^-0.5 * min(1, 1e-4/...) -> tiny but nonzero; sign negative.
    assert float(jnp.max(updates["w"])) < 0


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = _smoke_cfg(**{
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 4,
        "training_args.max_files": 8,
        "training_args.compute_dtype": "float32",
        # Short warmup so the Noam LR is non-negligible within the test steps
        # (the real 10k warmup would leave lr ~ 4e-6 at step 60), but long
        # enough not to diverge on the tiny batch; clip tight for stability.
        "training_args.warmup_steps": 400,
        "training_args.clip_grad": 1.0,
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    })
    return Trainer(cfg)


def test_single_train_step(tiny_trainer):
    t = tiny_trainer
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()  # pre-donation copy
    state2, metrics = step(state, jax.random.PRNGKey(0))
    m = np.asarray(metrics)
    assert m.shape == (3,)
    assert np.all(np.isfinite(m))
    assert int(state2.step) == 1
    after = np.asarray(jax.tree.leaves(state2.params)[0])
    assert not np.allclose(before, after)


def test_loss_decreases_over_steps(tiny_trainer):
    """~120 steps on 8 synthetic samples must cut the loss substantially."""
    t = tiny_trainer
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(120):
        state, metrics = step(state, jax.random.fold_in(key, i))
        losses.append(float(metrics[0]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.all(np.isfinite(losses))
    assert last < first * 0.8, (first, last)

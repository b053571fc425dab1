"""EMA of parameters (training_args.ema_decay) — capability superset.

The reference has no EMA at all; dhg keeps a per-step exponential moving
average shadow of the params inside the jitted step, checkpoints it, and
prefers it at inference (standard practice for diffusion models).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.checkpoint import load_checkpoint, load_model, save_checkpoint
from dhg.config import DLConfig, fit_config
from dhg.train import Trainer

DECAY = 0.5  # aggressive so a few steps separate ema from params measurably

TINY = {
    "training_args.channels": 32,
    "training_args.att_layers_num": 1,
    "training_args.batch_size": 4,
    "training_args.max_files": 8,
    "training_args.compute_dtype": "float32",
    "training_args.warmup_steps": 10,  # big lr fast: params move immediately
    "training_args.clip_grad": 1.0,
    "dataset_args.max_seq_len": 96,
    "dataset_args.max_text_len": 20,
}


def _trainer(**overrides):
    return Trainer(DLConfig(fit_config(config="smoke.yml", **{**TINY, **overrides})))


def _leaves(tree):
    return jax.tree.leaves(tree)


def test_ema_off_by_default():
    t = _trainer()
    assert t.ema_decay == 0.0
    state = t.init_state(0)
    assert state.ema_params is None
    data = t.load_dataset()
    step = t.make_step_fn(data)
    state, _ = step(state, jax.random.PRNGKey(0))
    assert state.ema_params is None  # stays None through the jitted step


def test_ema_tracks_manual_average():
    t = _trainer(**{"training_args.ema_decay": DECAY})
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)

    manual = jax.tree.map(np.asarray, state.params)
    for i in range(3):
        state, _ = step(state, jax.random.PRNGKey(i))
        manual = jax.tree.map(
            lambda e, p: e * DECAY + np.asarray(p) * (1.0 - DECAY),
            manual,
            state.params,
        )
    for got, want in zip(_leaves(state.ema_params), _leaves(manual)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-7)
    # And the shadow genuinely differs from the live params by now.
    diffs = [
        float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
        for e, p in zip(_leaves(state.ema_params), _leaves(state.params))
    ]
    assert max(diffs) > 1e-6


def test_ema_through_chunked_scan_matches_per_step():
    """The lax.scan chunk path must produce the same EMA as K per-step calls
    (bit-identical keys via fold_in, same update rule).

    Runs at a MODERATE warmup (not TINY's warmup=10): scan vs eager compiles
    reorder float math, and at near-peak Noam LR the ~1e-7 rounding gap
    amplifies chaotically through Adam within 4 steps (measured: leaves off
    by the full update magnitude). warmup=200 keeps per-step updates
    ~2e-4 — large enough that a chunk path which silently skipped the EMA
    update would miss by ~1e-4 (caught below), small enough that the two
    trajectories agree at the established params-parity tolerance
    (tests/test_chunked_train.py)."""
    t1 = _trainer(**{"training_args.ema_decay": DECAY, "training_args.warmup_steps": 200})
    data = t1.load_dataset()
    root = jax.random.PRNGKey(42)

    state_a = t1.init_state(0)
    init_ema = jax.tree.map(np.asarray, state_a.ema_params)
    step = t1.make_step_fn(data)
    for c in [1, 2, 3, 4]:
        state_a, _ = step(state_a, jax.random.fold_in(root, c))

    state_b = t1.init_state(0)
    chunk = t1.make_chunk_fn(data)
    state_b, _ = chunk(state_b, root, jnp.arange(1, 5, dtype=jnp.int32))

    # Sensitivity guard: the chunk's EMA must have genuinely moved from its
    # init by more than the comparison tolerance (else a no-op EMA inside
    # the scan would pass the allclose vacuously).
    moved = max(
        float(np.max(np.abs(np.asarray(b) - i)))
        for b, i in zip(_leaves(state_b.ema_params), _leaves(init_ema))
    )
    assert moved > 1e-4, moved

    for a, b in zip(_leaves(state_a.ema_params), _leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip_and_load_model_prefers_ema(tmp_path):
    t = _trainer(**{"training_args.ema_decay": DECAY})
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    for i in range(2):
        state, _ = step(state, jax.random.PRNGKey(i))

    ckpt = tmp_path / "model_final"
    save_checkpoint(ckpt, state.params, ema_params=state.ema_params)
    t.cfg.dump(tmp_path / "config.yml")

    restored = load_checkpoint(ckpt)
    assert "ema_params" in restored

    _, ema_loaded = load_model(tmp_path / "config.yml", ckpt)  # default use_ema=True
    _, raw_loaded = load_model(tmp_path / "config.yml", ckpt, use_ema=False)
    for got, want in zip(_leaves(ema_loaded), _leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(_leaves(raw_loaded), _leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # The two loads must differ (otherwise use_ema is a no-op).
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(_leaves(ema_loaded), _leaves(raw_loaded))
    )


def test_resume_restores_ema_and_continues_identically(tmp_path):
    """SIGTERM-style save at step 2 + resume == uninterrupted run, for the
    EMA leaves as well as params (true-resume contract extended to EMA)."""
    t = _trainer(**{"training_args.ema_decay": DECAY})
    data = t.load_dataset()
    root = jax.random.PRNGKey(7)
    step = t.make_step_fn(data)

    # Uninterrupted: 4 steps.
    full = t.init_state(0)
    for c in [1, 2, 3, 4]:
        full, _ = step(full, jax.random.fold_in(root, c))

    # Interrupted at 2, checkpointed, resumed, 2 more.
    half = t.init_state(0)
    for c in [1, 2]:
        half, _ = step(half, jax.random.fold_in(root, c))
    ckpt = tmp_path / "checkpoint_2"
    save_checkpoint(
        ckpt, half.params, opt_state=half.opt_state, step=2, ema_params=half.ema_params
    )

    t2 = _trainer(**{"training_args.ema_decay": DECAY})
    resumed, start = t2.resume_state(t2.init_state(0), ckpt)
    assert start == 2
    step2 = t2.make_step_fn(data)
    for c in [3, 4]:
        resumed, _ = step2(resumed, jax.random.fold_in(root, c))

    for a, b in zip(_leaves(full.ema_params), _leaves(resumed.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


def test_resume_from_pre_ema_checkpoint_restarts_shadow(tmp_path):
    """A checkpoint written without EMA resumes cleanly into an EMA-enabled
    run: the shadow restarts from the restored params."""
    t0 = _trainer()
    data = t0.load_dataset()
    state = t0.init_state(0)
    step = t0.make_step_fn(data)
    state, _ = step(state, jax.random.PRNGKey(0))
    ckpt = tmp_path / "checkpoint_1"
    save_checkpoint(ckpt, state.params, opt_state=state.opt_state, step=1)

    t1 = _trainer(**{"training_args.ema_decay": DECAY})
    resumed, start = t1.resume_state(t1.init_state(0), ckpt)
    assert start == 1
    for e, p in zip(_leaves(resumed.ema_params), _leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    # And it steps without donation/aliasing trouble.
    step1 = t1.make_step_fn(data)
    resumed, metrics = step1(resumed, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(metrics)))


def test_invalid_decay_rejected():
    with pytest.raises(ValueError):
        _trainer(**{"training_args.ema_decay": 1.0})

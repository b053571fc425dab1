"""Validation evaluation utility + standalone eval CLI."""

import numpy as np
import pytest

import jax

from dhg.data.pipeline import synthetic_cache
from dhg.eval import evaluate
from dhg.models.denoiser import DiffusionModel

import jax.numpy as jnp


def test_evaluate_returns_finite_triplet():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=8, max_seq_len=96, max_text_len=20, seed=0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]
    out = evaluate(model, params, cache, batch_size=4, seed=0)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))
    # total = score + pen
    assert np.isclose(out[0], out[1] + out[2], rtol=1e-5)


def test_evaluate_deterministic():
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=8, max_seq_len=96, max_text_len=20, seed=1)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]
    a = evaluate(model, params, cache, batch_size=4, seed=7)
    b = evaluate(model, params, cache, batch_size=4, seed=7)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_evaluate_includes_tail_batch():
    """n % batch_size != 0: every sample must contribute (the tail batch is
    not dropped). The tail samples carry enormous strokes, so dropping them
    would leave the loss near the clean-8-sample value."""
    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    cache = synthetic_cache(n=10, max_seq_len=96, max_text_len=20, seed=2)
    cache.strokes[8:, :, :2] = 50.0  # pathological tail -> huge score loss
    params = model.init(
        jax.random.PRNGKey(2),
        jnp.asarray(cache.strokes[:1, :, :2]),
        jnp.asarray(cache.text[:1]),
        jnp.ones((1, 1)),
        jnp.asarray(cache.style[:1]),
    )["params"]

    full = evaluate(model, params, cache, batch_size=4, seed=0)

    import copy

    head = copy.deepcopy(cache)
    head.strokes = cache.strokes[:8]
    head.text = cache.text[:8]
    head.style = cache.style[:8]
    head.sample_ids = cache.sample_ids[:8]
    clean = evaluate(model, params, head, batch_size=4, seed=0)

    assert full[0] > clean[0] * 1.15, (full[0], clean[0])


# -- standalone CLI (python -m dhg.eval) --------------------------------------


@pytest.fixture(scope="module")
def eval_experiment(tmp_path_factory):
    """Run dir with config.yml + model_final carrying a distinct EMA shadow."""
    from dhg.checkpoint import save_checkpoint
    from dhg.config import DLConfig, fit_config
    from dhg.train import Trainer

    exp_dir = tmp_path_factory.mktemp("eval_exp")
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "training_args.batch_size": 4,
                "training_args.max_files": 8,
                "training_args.compute_dtype": "float32",
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    t = Trainer(cfg)
    state = t.init_state(0)
    # A deliberately different EMA shadow so ema-vs-raw is observable.
    ema = jax.tree.map(lambda x: x * 0.5, state.params)
    save_checkpoint(exp_dir / "model_final", state.params, ema_params=ema)
    cfg.dump(exp_dir / "config.yml")
    return exp_dir


def test_evaluate_checkpoint_validation_split(eval_experiment):
    from dhg.eval import evaluate_checkpoint

    out = evaluate_checkpoint(experiment_path=str(eval_experiment), batch_size=8)
    assert np.shape(out) == (3,)
    assert np.all(np.isfinite(out))
    assert np.isclose(out[0], out[1] + out[2], rtol=1e-5)


def test_evaluate_checkpoint_ema_vs_raw_and_train_split(eval_experiment):
    """use_ema toggles which weights are scored; train split is reachable."""
    from dhg.eval import evaluate_checkpoint

    ema = evaluate_checkpoint(experiment_path=str(eval_experiment), batch_size=8)
    raw = evaluate_checkpoint(
        experiment_path=str(eval_experiment), batch_size=8, use_ema=False
    )
    assert not np.allclose(ema, raw), "EMA preference had no effect"

    tr = evaluate_checkpoint(
        experiment_path=str(eval_experiment), split="train", batch_size=8
    )
    val = evaluate_checkpoint(experiment_path=str(eval_experiment), batch_size=8)
    assert np.all(np.isfinite(tr))
    assert not np.allclose(tr, val), "train/val splits scored identical data"


def test_eval_cli_prints_val_line(eval_experiment, capsys):
    from dhg.eval import main

    main([f"--experiment_path={eval_experiment}", "--batch_size=8"])
    line = capsys.readouterr().out.strip()
    assert line.startswith("Val Loss: ")
    assert "| Val Score: " in line and "| Val Pen: " in line


def test_eval_cli_requires_checkpoint(tmp_path):
    from dhg.eval import evaluate_checkpoint

    with pytest.raises(ValueError, match="config_path and checkpoint_path"):
        evaluate_checkpoint(experiment_path=str(tmp_path / "nope"))

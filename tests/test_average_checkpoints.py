"""Checkpoint averaging (SWA / model-soup tool, capability superset)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.checkpoint import load_checkpoint, save_checkpoint
from dhg.tools.average_checkpoints import (
    average_checkpoints,
    average_trees,
    numbered_checkpoints,
)


def _tree(scale):
    return {
        "a": {"kernel": np.full((3, 2), float(scale), np.float32)},
        "b": {"bias": np.arange(4, dtype=np.float32) * scale},
    }


def test_average_trees_uniform_and_weighted():
    avg = average_trees([_tree(1.0), _tree(3.0)])
    np.testing.assert_allclose(avg["a"]["kernel"], 2.0)
    np.testing.assert_allclose(avg["b"]["bias"], np.arange(4) * 2.0)

    weighted = average_trees([_tree(1.0), _tree(3.0)], weights=[3.0, 1.0])
    np.testing.assert_allclose(weighted["a"]["kernel"], 1.5)

    with pytest.raises(ValueError, match="weights"):
        average_trees([_tree(1.0)], weights=[1.0, 2.0])


def test_average_checkpoints_end_to_end(tmp_path):
    """Two saved checkpoints (with EMA) -> averaged dir loadable as usual."""
    for i, scale in enumerate((1.0, 3.0)):
        save_checkpoint(
            tmp_path / f"checkpoint_{(i + 1) * 50}",
            _tree(scale),
            ema_params=_tree(scale * 10),
        )
    payload = average_checkpoints(
        [tmp_path / "checkpoint_50", tmp_path / "checkpoint_100"],
        tmp_path / "soup",
    )
    np.testing.assert_allclose(payload["params"]["a"]["kernel"], 2.0)
    np.testing.assert_allclose(payload["ema_params"]["a"]["kernel"], 20.0)

    restored = load_checkpoint(tmp_path / "soup")
    np.testing.assert_allclose(restored["params"]["a"]["kernel"], 2.0)
    np.testing.assert_allclose(restored["ema_params"]["a"]["kernel"], 20.0)


def test_ema_dropped_unless_everywhere(tmp_path):
    save_checkpoint(tmp_path / "c1", _tree(1.0), ema_params=_tree(5.0))
    save_checkpoint(tmp_path / "c2", _tree(3.0))  # no EMA
    payload = average_checkpoints([tmp_path / "c1", tmp_path / "c2"], tmp_path / "soup")
    assert "ema_params" not in payload


def test_numbered_discovery_and_cli(tmp_path, monkeypatch, capsys):
    for step, scale in ((50, 1.0), (100, 2.0), (150, 6.0)):
        save_checkpoint(tmp_path / f"checkpoint_{step}", _tree(scale))
    (tmp_path / "checkpoint_bogus").mkdir()  # ignored (non-numeric)

    found = numbered_checkpoints(tmp_path)
    assert [p.name for p in found] == ["checkpoint_50", "checkpoint_100", "checkpoint_150"]
    assert [p.name for p in numbered_checkpoints(tmp_path, last=2)] == [
        "checkpoint_100",
        "checkpoint_150",
    ]

    from dhg.tools import average_checkpoints as cli

    dst = tmp_path / "soup_cli"
    monkeypatch.setattr(
        sys,
        "argv",
        ["avg", f"--dst={dst}", f"--experiment_path={tmp_path}", "--last=2"],
    )
    cli.main()
    assert "mean of 2 checkpoints" in capsys.readouterr().out
    restored = load_checkpoint(dst)
    np.testing.assert_allclose(restored["params"]["a"]["kernel"], 4.0)


def test_averaged_checkpoint_loads_into_model(tmp_path):
    """The soup is a first-class checkpoint: resolve_checkpoint + load_model
    + generate all accept it (written as model_final of a fresh dir)."""
    from dhg.config import DLConfig, fit_config
    from dhg.models.denoiser import DiffusionModel

    model = DiffusionModel(num_layers=1, c1=32, c2=48, c3=64)
    p1 = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    p2 = jax.tree.map(lambda x: x + 0.01, p1)
    save_checkpoint(tmp_path / "checkpoint_10", p1)
    save_checkpoint(tmp_path / "checkpoint_20", p2)

    exp = tmp_path / "soup_exp"
    average_checkpoints(
        [tmp_path / "checkpoint_10", tmp_path / "checkpoint_20"],
        exp / "model_final",
    )
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    cfg.dump(exp / "config.yml")

    from dhg.checkpoint import load_model, resolve_checkpoint

    ckpt = resolve_checkpoint(exp)
    assert ckpt is not None and ckpt.name == "model_final"
    _, params = load_model(exp / "config.yml", ckpt)
    np.testing.assert_allclose(
        np.asarray(params["input_dense"]["kernel"]),
        np.asarray(p1["input_dense"]["kernel"]) + 0.005,
        rtol=1e-6,
        atol=1e-7,
    )

"""Checkpoint save/load roundtrip + discovery-order semantics."""

import jax.numpy as jnp
import numpy as np

from dhg.checkpoint import (
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
)


def _params():
    return {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)}}


def test_roundtrip(tmp_path):
    p = _params()
    save_checkpoint(tmp_path / "checkpoint_10", p, step=10, meta={"run": "x"})
    out = load_checkpoint(tmp_path / "checkpoint_10")
    assert np.allclose(out["params"]["layer"]["kernel"], np.arange(6.0).reshape(2, 3))
    assert int(out["step"]) == 10


def test_roundtrip_with_opt_state(tmp_path):
    p = _params()
    opt = {"mu": jnp.zeros((2, 3))}
    save_checkpoint(tmp_path / "checkpoint_5", p, opt_state=opt, step=5)
    out = load_checkpoint(tmp_path / "checkpoint_5")
    assert "opt_state" in out


def test_discovery_order(tmp_path):
    p = _params()
    save_checkpoint(tmp_path / "checkpoint_100", p)
    save_checkpoint(tmp_path / "checkpoint_900", p)
    assert resolve_checkpoint(tmp_path).name == "checkpoint_900"

    save_checkpoint(tmp_path / "model_last", p)
    assert resolve_checkpoint(tmp_path).name == "model_last"

    save_checkpoint(tmp_path / "model_final", p)
    assert resolve_checkpoint(tmp_path).name == "model_final"


def test_discovery_ignores_non_numeric(tmp_path):
    p = _params()
    save_checkpoint(tmp_path / "checkpoint_42", p)
    save_checkpoint(tmp_path / "checkpoint_last", p)  # non-numeric suffix
    assert resolve_checkpoint(tmp_path).name == "checkpoint_42"


def test_discovery_empty(tmp_path):
    assert resolve_checkpoint(tmp_path) is None

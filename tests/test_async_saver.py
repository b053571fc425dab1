"""AsyncSaver: snapshot-on-submit semantics, drain-on-wait, retention."""

import numpy as np
import pytest

import jax.numpy as jnp

from dhg.checkpoint import AsyncSaver, load_checkpoint, prune_numbered_checkpoints


def test_async_save_roundtrip(tmp_path):
    saver = AsyncSaver()
    params = {"w": jnp.arange(12.0).reshape(3, 4)}
    opt = {"mu": {"w": jnp.ones((3, 4))}}
    saver.submit(tmp_path / "checkpoint_7", params, opt_state=opt, step=7)
    saver.wait()
    out = load_checkpoint(tmp_path / "checkpoint_7")
    np.testing.assert_allclose(out["params"]["w"], np.arange(12.0).reshape(3, 4))
    assert int(out["step"]) == 7
    assert "opt_state" in out


def test_submit_snapshots_before_mutation(tmp_path):
    """The saved value must be the submit-time value, not a later one."""
    saver = AsyncSaver()
    arr = np.zeros((4,), np.float32)
    saver.submit(tmp_path / "checkpoint_1", {"w": arr.copy()})
    arr += 99.0  # mutate after submit — must not affect the saved data
    saver.wait()
    out = load_checkpoint(tmp_path / "checkpoint_1")
    np.testing.assert_allclose(out["params"]["w"], np.zeros((4,)))


def test_multiple_saves_ordered(tmp_path):
    saver = AsyncSaver()
    for i in range(3):
        saver.submit(tmp_path / f"checkpoint_{i}", {"w": jnp.full((2,), float(i))})
    saver.wait()
    for i in range(3):
        out = load_checkpoint(tmp_path / f"checkpoint_{i}")
        np.testing.assert_allclose(out["params"]["w"], np.full((2,), float(i)))


def test_retention_keeps_newest_n(tmp_path):
    """keep=2 retains only the two highest-numbered checkpoints; named
    saves are never pruned (training_args.keep_checkpoints superset)."""
    saver = AsyncSaver()
    saver.submit(tmp_path / "model_last", {"w": jnp.zeros((2,))})
    for step in (5, 10, 15, 20):
        saver.submit(
            tmp_path / f"checkpoint_{step}", {"w": jnp.full((2,), float(step))}, keep=2
        )
    saver.wait()
    left = sorted(p.name for p in tmp_path.glob("checkpoint_*"))
    assert left == ["checkpoint_15", "checkpoint_20"]
    assert (tmp_path / "model_last").exists()
    # The survivors are intact, loadable checkpoints.
    out = load_checkpoint(tmp_path / "checkpoint_20")
    np.testing.assert_allclose(out["params"]["w"], np.full((2,), 20.0))


def test_retention_off_keeps_all(tmp_path):
    saver = AsyncSaver()
    for step in (1, 2, 3):
        saver.submit(tmp_path / f"checkpoint_{step}", {"w": jnp.zeros((2,))}, keep=None)
    saver.wait()
    assert len(list(tmp_path.glob("checkpoint_*"))) == 3


def test_prune_ignores_non_numbered_and_validates(tmp_path):
    (tmp_path / "checkpoint_last").mkdir()
    (tmp_path / "checkpoint_7").mkdir()
    (tmp_path / "checkpoint_9").mkdir()
    pruned = prune_numbered_checkpoints(tmp_path, keep=1)
    assert [p.name for p in pruned] == ["checkpoint_7"]
    assert (tmp_path / "checkpoint_last").exists()
    assert (tmp_path / "checkpoint_9").exists()
    with pytest.raises(ValueError):
        prune_numbered_checkpoints(tmp_path, keep=0)

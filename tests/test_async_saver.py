"""AsyncSaver: snapshot-on-submit semantics and drain-on-wait."""

import numpy as np

import jax.numpy as jnp

from dhg.checkpoint import AsyncSaver, load_checkpoint


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

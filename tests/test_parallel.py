"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.config import DLConfig, fit_config
from dhg.parallel.mesh import make_mesh
from dhg.parallel.sharding import param_shardings
from dhg.train import Trainer


def _cfg(**overrides):
    base = {
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 8,
        "training_args.max_files": 16,
        "training_args.compute_dtype": "float32",
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    }
    base.update(overrides)
    return DLConfig(fit_config(config="smoke.yml", **base))


def test_mesh_axes(eight_devices):
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_shardings_cover_tree(eight_devices):
    t = Trainer(_cfg(), mesh=make_mesh(model_parallel=2))
    state = t.init_state(0)
    shardings = param_shardings(state.params, t.mesh)
    flat_p = jax.tree.leaves(state.params)
    flat_s = jax.tree.leaves(shardings, is_leaf=lambda x: hasattr(x, "spec"))
    assert len(flat_p) == len(flat_s)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_dp_tp_train_step(eight_devices, model_parallel):
    """Full fused train step over a (8/mp, mp) mesh runs and is finite."""
    mesh = make_mesh(model_parallel=model_parallel)
    t = Trainer(_cfg(), mesh=mesh)
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    state, metrics = step(state, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(metrics)))


def test_dp_matches_single_device_loss():
    """Same seed, same batch: the dp-sharded step computes the same loss."""
    mesh8 = make_mesh()  # (8, 1)
    mesh1 = make_mesh(data_parallel=1, model_parallel=1)

    cfgs = _cfg()
    t8 = Trainer(cfgs, mesh=mesh8)
    t1 = Trainer(cfgs, mesh=mesh1)

    d8, d1 = t8.load_dataset(), t1.load_dataset()
    s8, s1 = t8.init_state(0), t1.init_state(0)
    m8 = t8.make_step_fn(d8)(s8, jax.random.PRNGKey(3))[1]
    m1 = t1.make_step_fn(d1)(s1, jax.random.PRNGKey(3))[1]
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), rtol=2e-4)

"""Seed-to-loss reproducibility: two independent Trainers, identical runs.

A guarantee the reference cannot make (its global-RNG torch pipeline plus
unseeded dataset randomness, SURVEY §7 'RNG discipline'): in dhg the whole
run is a pure function of the config seed.
"""

import numpy as np

import jax

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer


def _cfg():
    return DLConfig(
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


def _run(n_steps=4):
    t = Trainer(_cfg())
    data = t.load_dataset()
    state = t.init_state(t.cfg.experiment.seed or 0)
    step = t.make_step_fn(data)
    key = jax.random.PRNGKey((t.cfg.experiment.seed or 0) + 1)
    out = []
    for i in range(n_steps):
        state, metrics = step(state, jax.random.fold_in(key, i))
        out.append(np.asarray(metrics))
    return np.stack(out), np.asarray(jax.tree.leaves(state.params)[0])


def test_same_seed_same_losses_and_params():
    m1, p1 = _run()
    m2, p2 = _run()
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(p1, p2)

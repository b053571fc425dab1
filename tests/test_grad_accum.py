"""Gradient accumulation (training_args.grad_accum — capability superset).

The accumulated step draws the SAME batch/alpha/noise as the unsplit step
and averages equal-size micro-chunk grads, so with dropout inactive it must
equal the grad_accum=1 step up to float reassociation
(dhg/train.py::_build_step). Dropout masks are the ONE source of real
divergence — the TextStyleEncoder's architectural dropout(0.3) draws
per-chunk masks — so the exactness test patches Dropout to identity; the
stability test runs the stock model (live dropout, unbiased grads).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax

from dhg.config import DLConfig, fit_config
from dhg.train import Trainer


def _trainer(**overrides):
    base = {
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 8,
        "training_args.max_files": 16,
        "training_args.compute_dtype": "float32",
        "training_args.warmup_steps": 400,
        "training_args.clip_grad": 1.0,
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    }
    base.update(overrides)
    return Trainer(DLConfig(fit_config(config="smoke.yml", **base)))


@pytest.mark.parametrize("accum", [2, 4])
def test_accumulated_step_matches_unsplit(accum, monkeypatch):
    # Identity dropout: isolates the slicing/averaging/key discipline —
    # the properties this feature could get wrong — from mask sampling.
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    ref = _trainer()
    acc = _trainer(**{"training_args.grad_accum": accum})
    data = ref.load_dataset()

    key = jax.random.PRNGKey(3)
    s_ref, m_ref = ref.make_step_fn(data)(ref.init_state(0), key)
    s_acc, m_acc = acc.make_step_fn(data)(acc.init_state(0), key)

    np.testing.assert_allclose(np.asarray(m_acc), np.asarray(m_ref), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_acc.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_accumulated_training_is_stable():
    t = _trainer(**{"training_args.grad_accum": 2})
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(40):
        state, metrics = step(state, jax.random.fold_in(key, i))
        losses.append(float(metrics[0]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_grad_accum_must_divide_batch():
    with pytest.raises(ValueError):
        _trainer(**{"training_args.grad_accum": 3})

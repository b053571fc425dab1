"""On-device stroke augmentation (dataset_args.augment — capability superset).

Pure-function contracts for dhg/data/pipeline.py::augment_matrices /
augment_strokes, plus the train-step wiring (augmentation fused into the
jitted step; off by default with bit-identical RNG streams).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhg.config import DLConfig, fit_config
from dhg.data.pipeline import augment_matrices, augment_strokes
from dhg.train import Trainer


def test_zero_knobs_are_exact_identity():
    mats = augment_matrices(jax.random.PRNGKey(0), 7)
    np.testing.assert_array_equal(
        np.asarray(mats), np.broadcast_to(np.eye(2, dtype=np.float32), (7, 2, 2))
    )


def test_pure_rotation_preserves_delta_norms():
    key = jax.random.PRNGKey(1)
    xy = jax.random.normal(key, (5, 40, 2))
    strokes3 = jnp.concatenate([xy, jnp.zeros((5, 40, 1))], -1)
    out = augment_strokes(jax.random.PRNGKey(2), strokes3, rotate=1.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :2]), axis=-1),
        np.linalg.norm(np.asarray(xy), axis=-1),
        rtol=1e-5,
    )
    # Rotation actually happened (outputs differ).
    assert not np.allclose(np.asarray(out[..., :2]), np.asarray(xy))


def test_scale_bounds_and_determinism():
    mats = augment_matrices(jax.random.PRNGKey(3), 64, scale=0.2)
    s = np.linalg.norm(np.asarray(mats), axis=(1, 2)) / np.sqrt(2.0)  # isotropic factor
    assert s.min() >= 0.8 - 1e-6 and s.max() <= 1.2 + 1e-6
    mats2 = augment_matrices(jax.random.PRNGKey(3), 64, scale=0.2)
    np.testing.assert_array_equal(np.asarray(mats), np.asarray(mats2))


def test_padding_rows_and_pen_channel_preserved():
    strokes3 = np.zeros((3, 10, 3), np.float32)
    strokes3[:, :4, :2] = np.random.RandomState(0).randn(3, 4, 2)
    pen = (np.random.RandomState(1).rand(3, 10) < 0.5).astype(np.float32)
    strokes3[..., 2] = pen
    out = np.asarray(
        augment_strokes(
            jax.random.PRNGKey(4), jnp.asarray(strokes3), scale=0.2, rotate=0.3, shear=0.1
        )
    )
    np.testing.assert_array_equal(out[:, 4:, :2], 0.0)  # padding stays (0, 0)
    np.testing.assert_array_equal(out[..., 2], pen)  # pen untouched


@pytest.fixture(scope="module")
def cfg_overrides():
    return {
        "training_args.channels": 32,
        "training_args.att_layers_num": 1,
        "training_args.batch_size": 4,
        "training_args.max_files": 8,
        "training_args.compute_dtype": "float32",
        "training_args.warmup_steps": 400,
        "training_args.clip_grad": 1.0,
        "dataset_args.max_seq_len": 96,
        "dataset_args.max_text_len": 20,
    }


def test_train_step_with_augmentation(cfg_overrides):
    over = dict(cfg_overrides)
    over["dataset_args.augment"] = {"scale": 0.1, "rotate": 0.1, "shear": 0.05}
    t = Trainer(DLConfig(fit_config(config="smoke.yml", **over)))
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    state, metrics = step(state, jax.random.PRNGKey(0))
    m = np.asarray(metrics)
    assert m.shape == (3,) and np.all(np.isfinite(m))


def test_augment_off_is_bit_identical_to_absent(cfg_overrides):
    """augment: {all-zero} must not perturb the RNG stream or the math —
    same metrics as a config with no augment key at all."""
    t_plain = Trainer(DLConfig(fit_config(config="smoke.yml", **cfg_overrides)))
    over = dict(cfg_overrides)
    over["dataset_args.augment"] = {"scale": 0.0}
    t_zero = Trainer(DLConfig(fit_config(config="smoke.yml", **over)))
    data = t_plain.load_dataset()
    key = jax.random.PRNGKey(7)
    _, m_plain = t_plain.make_step_fn(data)(t_plain.init_state(0), key)
    _, m_zero = t_zero.make_step_fn(data)(t_zero.init_state(0), key)
    np.testing.assert_array_equal(np.asarray(m_plain), np.asarray(m_zero))

"""Torch-checkpoint converter: full tree coverage + shape compatibility."""

import numpy as np

import flax
import jax
import jax.numpy as jnp

from dhg.models.denoiser import DiffusionModel
from dhg.tools.convert_torch_checkpoint import convert_state_dict


def _fake_reference_state_dict(num_layers=1, c1=128, c2=192, c3=256):
    """Build a state_dict with the reference's names/shapes (random values).

    Uses the default 128/192/256 channel plan: the reference hard-codes the
    affine conditioning input width at 32 (conditioning.py:9), which equals
    c1 // 4 only for channels=128 — real reference checkpoints always
    satisfy this.
    """
    rng = np.random.RandomState(0)
    sd: dict[str, np.ndarray] = {}

    def lin(key, i, o):
        sd[f"{key}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(o).astype(np.float32)

    def conv(key, i, o):
        sd[f"{key}.weight"] = rng.randn(o, i, 3).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(o).astype(np.float32)

    def ffn(key, i, o, h):
        lin(f"{key}.1", i, h)
        lin(f"{key}.3", h, o)

    def affine(key, o):
        lin(f"{key}.gamma_emb", 32, o)
        lin(f"{key}.beta_emb", 32, o)

    def mha(key, d):
        for p in ("wq", "wk", "wv", "dense"):
            lin(f"{key}.{p}", d, d)

    def enc_layer(key, d_inp, d):
        lin(f"{key}.text_dense", d_inp, d)
        ffn(f"{key}.ffn", d, d, d * 2)
        mha(f"{key}.mha", d)
        mha(f"{key}.mha2", d)
        for i in range(4):
            affine(f"{key}.affine{i}", d)

    def conv_block(key, i, o):
        conv(f"{key}.conv_skip", i, o)
        conv(f"{key}.conv1", i, o // 2)
        conv(f"{key}.conv2", o // 2, o)
        lin(f"{key}.fc", o, o)
        affine(f"{key}.affine1", o // 2)
        affine(f"{key}.affine2", o)
        affine(f"{key}.affine3", o)

    d_model = c2 * 2
    lin("input_dense", 2, c1)
    ffn("sigma_ffn", 1, c1 // 4, 2048)
    sd["text_style_model.emb.weight"] = rng.randn(73, d_model).astype(np.float32)
    ffn("text_style_model.style_ffn", 256, d_model, c2 * 4)
    ffn("text_style_model.text_ffn", d_model, d_model, d_model * 2)
    mha("text_style_model.mha", d_model)
    for i in (1, 2, 3, 4):
        affine(f"text_style_model.affine{i}", d_model)

    conv_block("enc1", c1, c1)
    conv_block("enc2", c1, c2)
    enc_layer("enc3", d_model, c2)
    conv_block("enc4", c2, c3)
    enc_layer("enc5", d_model, c3)
    lin("att_dense", c1 * 2, d_model)
    for i in range(num_layers):
        enc_layer(f"att_layers.{i}", d_model, d_model)
    conv("skip_conv1", c1, c2)
    conv("skip_conv2", c2, c3)
    conv("skip_conv3", c3, d_model)
    conv_block("dec3", d_model, c3)
    conv_block("dec2", c3, c2)
    conv_block("dec1", c2, c1)
    lin("output_dense", c1, 2)
    lin("pen_lifts_dense.0", c1, 1)
    return sd


def test_converted_tree_matches_model_exactly():
    sd = _fake_reference_state_dict()
    converted = convert_state_dict(sd)

    model = DiffusionModel(num_layers=1)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 96, 2)),
            jnp.zeros((1, 20), jnp.int32),
            jnp.ones((1, 1)),
            jnp.zeros((1, 14, 1280)),
        )
    )
    want = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    got = flax.traverse_util.flatten_dict(converted, sep="/")
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5],
        sorted(set(got) - set(want))[:5],
    )
    for k in want:
        assert want[k].shape == np.shape(got[k]), k


def test_converted_params_run_forward():
    sd = _fake_reference_state_dict()
    params = jax.tree.map(jnp.asarray, convert_state_dict(sd))
    # Scale down: random N(0,1) weights explode activations; forward only
    # needs to be finite-checkable.
    params = jax.tree.map(lambda x: x * 0.05, params)
    model = DiffusionModel(num_layers=1)
    eps, pen = model.apply(
        {"params": params},
        jnp.zeros((1, 24, 2)),
        jnp.zeros((1, 20), jnp.int32),
        jnp.ones((1, 1)) * 0.5,
        jnp.zeros((1, 14, 1280)),
    )
    assert np.all(np.isfinite(np.asarray(eps)))
    assert np.all(np.isfinite(np.asarray(pen)))

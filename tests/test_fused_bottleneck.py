"""Pallas bottleneck megakernel vs the unfused XLA path (interpret mode).

The kernel (dhg/kernels/fused_bottleneck.py) runs att_dense + the whole
EncoderLayer stack for one batch row in a single Pallas program. It must
match the unfused bf16 path within bf16 tolerance given identical
precomputed kvs/films (the sampler's hoisted context).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhg.models.denoiser import DiffusionModel
from dhg.ops.basic import create_padding_mask


@pytest.fixture(scope="module")
def ctx():
    model = DiffusionModel(num_layers=2, c1=64, c2=96, c3=128, dtype=jnp.bfloat16)
    text = jax.random.randint(jax.random.PRNGKey(1), (3, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (3, 14, 1280))
    strokes = jax.random.normal(jax.random.PRNGKey(3), (3, 48, 2))
    sigma = jnp.full((3, 1), 0.7)
    params = model.init(jax.random.PRNGKey(0), strokes, text, sigma, style)["params"]

    sig1 = model.apply(
        {"params": params}, sigma[:1], method=DiffusionModel.embed_sigma
    )
    cond = model.apply(
        {"params": params}, text, style, sig1, method=DiffusionModel.encode_cond
    )
    kvs = model.apply(
        {"params": params}, cond, sig1, method=DiffusionModel.precompute_cross_kv
    )
    films = model.apply(
        {"params": params}, sig1, method=DiffusionModel.precompute_film
    )
    mask = create_padding_mask(text)
    # Pooled-h3-shaped input to the bottleneck: [B, T/8, c3]
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 6, 128), jnp.bfloat16)
    return model, params, x, kvs, films, mask


def _unfused(model, params, x, kvs, films, mask):
    def run(m, xb):
        h = m.att_dense(xb)
        af = films["attn"]
        for i, layer in enumerate(m.att_layers):
            h = layer.attend(h, kvs[2 + i], None, mask, True, af[2 + i])
        return h

    return model.apply({"params": params}, x, method=run)


def _fused(model, params, x, kvs, films, mask):
    def run(m, xb):
        return m._fused_bottleneck(xb, kvs, films, mask)

    return model.apply({"params": params}, x, method=run)


def test_fused_bottleneck_matches_unfused(ctx):
    model, params, x, kvs, films, mask = ctx
    a = np.asarray(_unfused(model, params, x, kvs, films, mask), np.float32)
    b = np.asarray(_fused(model, params, x, kvs, films, mask), np.float32)
    assert a.shape == b.shape == (3, 6, 192)
    # bf16 path, different op fusion order -> allow bf16-scale mismatch
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    # but the bulk must agree tightly
    assert np.median(np.abs(a - b)) < 5e-3


def test_fused_bottleneck_row_packed(ctx):
    """B=8 exercises rows=8 packing (one grid cell, 8x bigger matmuls)."""
    model, params, _, _, _, _ = ctx
    text = jax.random.randint(jax.random.PRNGKey(11), (8, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(12), (8, 14, 1280))
    sigma = jnp.full((1, 1), 0.5)
    sig1 = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig1, method=DiffusionModel.encode_cond
    )
    kvs = model.apply(
        {"params": params}, cond, sig1, method=DiffusionModel.precompute_cross_kv
    )
    films = model.apply(
        {"params": params}, sig1, method=DiffusionModel.precompute_film
    )
    mask = create_padding_mask(text)
    x = jax.random.normal(jax.random.PRNGKey(13), (8, 6, 128), jnp.bfloat16)
    a = np.asarray(_unfused(model, params, x, kvs, films, mask), np.float32)
    b = np.asarray(_fused(model, params, x, kvs, films, mask), np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert np.median(np.abs(a - b)) < 5e-3


@pytest.mark.parametrize("batch", [3, 4])  # rows=1 and rows=4 packing
def test_fused_unet_t4_matches_denoise(ctx, batch):
    """The extended T/4 megakernel path == plain denoise (bf16 tolerance)."""
    model, params, _, _, _, _ = ctx
    text = jax.random.randint(jax.random.PRNGKey(21), (batch, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(22), (batch, 14, 1280))
    strokes = jax.random.normal(jax.random.PRNGKey(23), (batch, 48, 2))
    sigma = jnp.full((1, 1), 0.6)
    sig1 = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig1, method=DiffusionModel.encode_cond
    )
    kvs = model.apply(
        {"params": params}, cond, sig1, method=DiffusionModel.precompute_cross_kv
    )
    films = model.apply(
        {"params": params}, sig1, method=DiffusionModel.precompute_film
    )
    mask = create_padding_mask(text)

    eps_a, pen_a = model.apply(
        {"params": params}, strokes, None, None, mask,
        method=DiffusionModel.denoise, kvs=kvs, films=films,
    )
    eps_b, pen_b = model.apply(
        {"params": params}, strokes, mask, kvs, films,
        method=DiffusionModel._denoise_fused_t4,
    )
    np.testing.assert_allclose(
        np.asarray(eps_a), np.asarray(eps_b), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(pen_a), np.asarray(pen_b), rtol=0.05, atol=0.05
    )
    assert np.median(np.abs(np.asarray(eps_a) - np.asarray(eps_b))) < 5e-3


@pytest.mark.parametrize("which", ["enc3", "enc5"])
def test_fused_single_encoder_layer(ctx, which):
    """The single-layer kernel == EncoderLayer.attend for enc3/enc5."""
    model, params, _, _, _, _ = ctx
    batch = 8
    text = jax.random.randint(jax.random.PRNGKey(31), (batch, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(32), (batch, 14, 1280))
    sigma = jnp.full((1, 1), 0.4)
    sig1 = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig1, method=DiffusionModel.encode_cond
    )
    kvs = model.apply(
        {"params": params}, cond, sig1, method=DiffusionModel.precompute_cross_kv
    )
    films = model.apply(
        {"params": params}, sig1, method=DiffusionModel.precompute_film
    )
    mask = create_padding_mask(text)
    idx = 0 if which == "enc3" else 1
    d = 96 if which == "enc3" else 128
    t = 24 if which == "enc3" else 12
    x = jax.random.normal(jax.random.PRNGKey(33), (batch, t, d), jnp.bfloat16)

    def run_ref(m, xb):
        layer = getattr(m, which)
        return layer.attend(xb, kvs[idx], None, mask, True, films["attn"][idx])

    def run_fused(m, xb):
        # pos_factor comes from layer.pos_factor (4.0 enc3 / 2.0 enc5).
        layer = getattr(m, which)
        return m._fused_layer(layer, xb, kvs[idx], films["attn"][idx], mask)

    a = np.asarray(model.apply({"params": params}, x, method=run_ref), np.float32)
    b = np.asarray(model.apply({"params": params}, x, method=run_fused), np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    assert np.median(np.abs(a - b)) < 5e-3


def test_sdpa_batched_matches_loop(ctx):
    """The rank-3 row-batched SDPA variant (DHG_SDPA_BATCHED, default on)
    computes the same contractions as the per-(row,head) loop — outputs
    must match exactly (on TPU hardware the A/B measured bit-identical;
    interpret mode runs both through jnp)."""
    from dhg.kernels.fused_bottleneck import fused_bottleneck
    from dhg.models import denoiser as dz

    model, params, x, kvs, films, mask = ctx

    def collect(m, xb):
        bf = jnp.bfloat16
        aw, ab = dz._wb(m.att_dense, bf)
        ops = []
        for i, layer in enumerate(m.att_layers):
            ops += dz._encoder_layer_ops(
                layer, kvs[2 + i], films["attn"][2 + i], bf
            )
        return aw, ab, tuple(ops)

    aw, ab, ops = model.apply({"params": params}, x, method=collect)
    from dhg.ops.attention import pos_embeddings

    pe = pos_embeddings(x.shape[1], 192, 1.0, jnp.bfloat16)[0]
    neg = (mask * -1e9).astype(jnp.bfloat16)[:, 0]
    kw = dict(num_layers=2, num_heads=6, rows=3, interpret=True)
    a = fused_bottleneck(x, aw, ab, pe, neg, ops, batched=False, **kw)
    b = fused_bottleneck(x, aw, ab, pe, neg, ops, batched=True, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_gate_requires_sampler_context(ctx):
    model, params, x, kvs, films, mask = ctx
    gate = model.apply(
        {"params": params}, kvs, films, True,
        method=DiffusionModel._can_fuse_bottleneck,
    )
    # On CPU (tests) the env flag is off -> gate is False; the helper must
    # also reject missing kvs/films regardless of flag.
    assert gate in (True, False)
    gate_none = model.apply(
        {"params": params}, None, None, True,
        method=DiffusionModel._can_fuse_bottleneck,
    )
    assert gate_none is False

"""Cross-attention K/V hoisting (the sampler's scan-body diet) is exact.

The sampler precomputes every EncoderLayer's text side — projection, LN,
affine, PE, K/V heads — for all 60 steps outside the lax.scan
(DiffusionModel.precompute_cross_kv + denoise(kvs=...)). These tests pin
that the restructured modules are numerically identical to the fused path,
and that the pure-function layer_norm matches flax nn.LayerNorm bitwise.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhg.models.denoiser import DiffusionModel
from dhg.ops.basic import create_padding_mask, layer_norm


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_layer_norm_matches_flax(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 96)).astype(
        dtype or jnp.float32
    )
    ref = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=dtype)
    got = layer_norm(x, dtype)
    want = ref.apply({}, x)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.fixture(scope="module")
def small_model():
    model = DiffusionModel(num_layers=2, c1=32, c2=48, c3=64)
    key = jax.random.PRNGKey(0)
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 1280))
    strokes = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 2))
    sigma = jnp.full((2, 1), 0.7)
    params = model.init(key, strokes, text, sigma, style)["params"]
    return model, params, strokes, text, sigma, style


def test_denoise_with_precomputed_kv_is_exact(small_model):
    model, params, strokes, text, sigma, style = small_model

    sig_emb = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    mask = create_padding_mask(text)

    eps_a, pen_a = model.apply(
        {"params": params}, strokes, cond, sig_emb, mask, method=DiffusionModel.denoise
    )
    kvs = model.apply(
        {"params": params}, cond, sig_emb, method=DiffusionModel.precompute_cross_kv
    )
    eps_b, pen_b = model.apply(
        {"params": params}, strokes, None, sig_emb, mask,
        method=DiffusionModel.denoise, kvs=kvs,
    )
    np.testing.assert_array_equal(np.asarray(eps_a), np.asarray(eps_b))
    np.testing.assert_array_equal(np.asarray(pen_a), np.asarray(pen_b))


def test_denoise_with_precomputed_kv_and_film_is_exact(small_model):
    """kvs + films precompute == plain denoise (the sampler's actual path)."""
    model, params, strokes, text, sigma, style = small_model
    sig_emb = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    mask = create_padding_mask(text)
    eps_a, pen_a = model.apply(
        {"params": params}, strokes, cond, sig_emb, mask, method=DiffusionModel.denoise
    )
    kvs = model.apply(
        {"params": params}, cond, sig_emb, method=DiffusionModel.precompute_cross_kv
    )
    films = model.apply(
        {"params": params}, sig_emb, method=DiffusionModel.precompute_film
    )
    eps_b, pen_b = model.apply(
        {"params": params}, strokes, None, None, mask,
        method=DiffusionModel.denoise, kvs=kvs, films=films,
    )
    np.testing.assert_array_equal(np.asarray(eps_a), np.asarray(eps_b))
    np.testing.assert_array_equal(np.asarray(pen_a), np.asarray(pen_b))
    assert len(films["conv"]) == 6 and len(films["attn"]) == 4


def test_kv_count_and_shapes(small_model):
    model, params, strokes, text, sigma, style = small_model
    sig_emb = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    kvs = model.apply(
        {"params": params}, cond, sig_emb, method=DiffusionModel.precompute_cross_kv
    )
    # (enc3, enc5, att_layers x2), each (K, V) [B, H, L, hd]
    assert len(kvs) == 4
    heads = [3, 4, 6, 6]
    dims = [48, 64, 96, 96]
    for (kh, vh), h, d in zip(kvs, heads, dims):
        assert kh.shape == (2, h, 10, d // h)
        assert vh.shape == kh.shape


def test_encode_cond_pre_tail_split_is_exact(small_model):
    """encode_cond == encode_cond_tail(encode_cond_pre) — and a B=1 sigma
    embedding broadcasts bit-identically (the sampler computes sigma-only
    tensors once per step, not once per step*batch)."""
    model, params, strokes, text, sigma, style = small_model
    sig_emb = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond_a = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    pre = model.apply(
        {"params": params}, text, style, method=DiffusionModel.encode_cond_pre
    )
    cond_b = model.apply(
        {"params": params}, pre, sig_emb, method=DiffusionModel.encode_cond_tail
    )
    np.testing.assert_array_equal(np.asarray(cond_a), np.asarray(cond_b))

    # sigma identical across batch -> B=1 embedding broadcasts. Exact math,
    # but XLA vectorizes matmuls differently per M, so only ~1e-7-close
    # (measured 3e-7 max), far inside the 1e-3 sampler parity bar.
    sig1_emb = model.apply(
        {"params": params}, sigma[:1], method=DiffusionModel.embed_sigma
    )
    cond_c = model.apply(
        {"params": params}, pre, sig1_emb, method=DiffusionModel.encode_cond_tail
    )
    np.testing.assert_allclose(
        np.asarray(cond_a), np.asarray(cond_c), rtol=1e-4, atol=1e-5
    )


def test_compact_hoist_matches_full(small_model):
    """hoist="compact" (K/V rebuilt in-scan from cond_all) must match
    hoist="full" (round-3 batch-512 HBM fix). Same ops, different
    scheduling: f32-tight but not bitwise (XLA re-tiles the per-step
    K/V matmuls inside the scan)."""
    from dhg.inference import generate

    model, params, strokes, text, sigma, style = small_model
    k = jax.random.PRNGKey(11)
    a = generate(model, params, text, style, k, seq_len=24, hoist="full")
    b = generate(model, params, text, style, k, seq_len=24, hoist="compact")
    # Measured drift: max abs 1.5e-5, MSE 1.6e-11 (f32 CPU) — re-tiled
    # matmuls over a 60-step trajectory, far inside the 1e-3 parity bar.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5)

    # Guided path too (null branch K/V also rebuilt in-scan).
    ag = generate(
        model, params, text, style, k, seq_len=24, hoist="full", guidance_scale=2.0
    )
    bg = generate(
        model, params, text, style, k, seq_len=24, hoist="compact", guidance_scale=2.0
    )
    np.testing.assert_allclose(np.asarray(ag), np.asarray(bg), rtol=1e-4, atol=5e-5)


def test_hoist_auto_selection(small_model):
    """generate() auto (hoist=None) is "compact" — the round-3 v5e sweep
    measured compact faster than full at EVERY batch size (PERFORMANCE.md
    "Round-3: hoist sweep") and it is the only mode that fits batch >= 512
    on 16 GB HBM. Auto must therefore match an explicit hoist="compact"
    bit-for-bit."""
    from dhg.inference import generate

    model, params, _, text, _, style = small_model
    k = jax.random.PRNGKey(3)
    auto = generate(model, params, text, style, k, seq_len=24)
    compact = generate(model, params, text, style, k, seq_len=24, hoist="compact")
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(compact))


def test_full_call_unchanged_by_refactor(small_model):
    """__call__ == embed/encode/denoise decomposition (regression guard)."""
    model, params, strokes, text, sigma, style = small_model
    out_a = model.apply({"params": params}, strokes, text, sigma, style)
    sig_emb = model.apply({"params": params}, sigma, method=DiffusionModel.embed_sigma)
    cond = model.apply(
        {"params": params}, text, style, sig_emb, method=DiffusionModel.encode_cond
    )
    mask = create_padding_mask(text)
    out_b = model.apply(
        {"params": params}, strokes, cond, sig_emb, mask, method=DiffusionModel.denoise
    )
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

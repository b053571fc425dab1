"""Pallas TPU megakernel: the sampler's whole attention bottleneck.

Round-2 profiling (PERFORMANCE.md) showed the 60-step sampler loop is
critical-path bound: ~520 small HLO ops per denoise step with dependency
gaps, not FLOP/bandwidth bound. The attention bottleneck stack
(att_dense + N EncoderLayers at T/8 = 49, width 384 — model.py:159-165 in
the reference) contributes the largest op count: per layer ~10 matmuls +
3 LayerNorms + 3 FiLM affines + softmaxes, each a separate HLO op.

This kernel runs the ENTIRE stack for one batch row in one Pallas program
invocation: all weights (~3.1M params bf16 = 6.2 MB) and the row's
activations ([49, 384]) stay VMEM-resident; one grid cell per batch row.
The cross-attention K/V come precomputed from the sampler's hoisted
text side (DiffusionModel.precompute_cross_kv), FiLM gamma/beta from
precompute_film — so the kernel needs zero sigma-side compute.

Enabled by DHG_FUSED_BOTTLENECK=1 (sampler path only: requires kvs+films
precomputed and bf16 compute dtype). FORWARD-ONLY: unlike fused_conv_block
these kernels define no custom_vjp — differentiating through them would
error. That is by design: the _can_fuse_* gates require precomputed
kvs/films, which only the (never-differentiated) sampler path supplies;
training always takes the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16

# Per-layer operand order (all bf16 unless noted):
#   kh, vh          [B, H, L, hd]  precomputed cross K/V (BHTD, as stored
#                                  by MultiHeadAttention.kv)
#   wq, bq          [D, D], [D]      cross-attn query projection
#   wo, bo          [D, D], [D]      cross-attn output projection
#   wq2, bq2, wk2, bk2, wv2, bv2     self-attn projections
#   wo2, bo2                         self-attn output projection
#   w1, b1          [D, 2D], [2D]    FFN fc1
#   w2, b2          [2D, D], [D]     FFN fc2
#   g1, be1, g2, be2, g3, be3  [1, D]  FiLM coefficients (B=1 broadcast)
_PER_LAYER = 24


def _dense(x, w, b):
    """flax Dense(dtype=bf16) semantics: bf16 matmul (f32 accum, one
    rounding to bf16), bf16 bias add."""
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=F32
    ).astype(BF16)
    return y + b


def _silu(x):
    """x * sigmoid(x) in f32 (Mosaic's logistic lowering rejects bf16
    broadcast of its f32 constants), rounded back to bf16."""
    xf = x.astype(F32)
    return (xf * (1.0 / (1.0 + jnp.exp(-xf)))).astype(BF16)


def _layer_norm(x, eps=1e-6):
    """dhg.ops.basic.layer_norm with dtype=bf16: f32 fast-variance stats,
    normalize the un-promoted input, cast back to bf16."""
    xf = x.astype(F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    return ((x - mu) * jax.lax.rsqrt(var + eps)).astype(BF16)


def _one_head(qh, kh, vh, scale, neg):
    """softmax(q k^T * scale + neg) v for one head: [T,hd] x [L,hd]."""
    logits = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=F32
    ).astype(BF16) * jnp.asarray(scale, BF16)
    if neg is not None:
        logits = logits + neg  # [T, L] + [1, L] broadcast
    lf = logits.astype(F32)
    lf = lf - jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
    return jax.lax.dot_general(
        w, vh, (((1,), (0,)), ((), ())), preferred_element_type=F32
    ).astype(BF16)


def _sdpa(q, k, v, num_heads, neg=None):
    """Per-head attention; q [T, D] with heads as column blocks (the flax
    reshape layout); k/v either column blocks [L, D] (self-attention,
    computed in-kernel) or head-major [H, L, hd] (precomputed cross K/V).
    Numerics match _sdpa_jnp: bf16 logits, f32 softmax, bf16 PV."""
    t, d = q.shape
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    head_major = k.ndim == 3
    outs = []
    for h in range(num_heads):
        qh = q[:, h * hd:(h + 1) * hd]
        kh = k[h] if head_major else k[:, h * hd:(h + 1) * hd]
        vh = v[h] if head_major else v[:, h * hd:(h + 1) * hd]
        outs.append(_one_head(qh, kh, vh, scale, neg))
    return jnp.concatenate(outs, axis=-1)


def _one_head_rows(qh, kh, vh, scale, neg):
    """softmax(q k^T * scale + neg) v for one head over ALL packed rows via
    rank-3 batched dots (Mosaic lowers batched dot_general natively):
    qh [R, T, hd], kh/vh [R, L, hd], neg [R, 1, L] or None. Element-wise
    the same op sequence as _one_head — bf16 logits (f32 MXU accum), f32
    softmax, bf16 PV — just batched over the row dim."""
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=F32
    ).astype(BF16) * jnp.asarray(scale, BF16)
    if neg is not None:
        logits = logits + neg  # [R, T, L] + [R, 1, L]
    lf = logits.astype(F32)
    lf = lf - jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf)
    w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
    return jax.lax.dot_general(
        w, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=F32
    ).astype(BF16)


def _sdpa_batched_rows(q, k, v, num_heads, rows, t, neg=None):
    """All packed rows' attention with one rank-3 dot pair per head (2H
    batched dots instead of 2*rows*H rank-2 dots — the loop-overhead cut
    DEVNOTES round-3 candidate #1 names "batched-head rank-3 dots").

    q [rows*T, D] with heads as column blocks; k/v either [rows, H, L, hd]
    head-major (precomputed cross K/V) or [rows*T, D] column blocks
    (self-attention). neg [rows, 1, L] or None. Returns [rows*T, D]."""
    d = q.shape[-1]
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    head_major = k.ndim == 4
    q3 = q.reshape(rows, t, d)
    if not head_major:
        k3 = k.reshape(rows, t, d)
        v3 = v.reshape(rows, t, d)
    outs = []
    for h in range(num_heads):
        qh = q3[:, :, h * hd:(h + 1) * hd]
        kh = k[:, h] if head_major else k3[:, :, h * hd:(h + 1) * hd]
        vh = v[:, h] if head_major else v3[:, :, h * hd:(h + 1) * hd]
        outs.append(_one_head_rows(qh, kh, vh, scale, neg))
    return jnp.concatenate(outs, axis=-1).reshape(rows * t, d)


def _encoder_layer(x, pe, negs, num_heads, rows, t, ops, batched=False):
    """One EncoderLayer.attend (dhg/models/encoder_layer.py) on `rows`
    packed batch rows: x, pe are [rows*T, D] so every dense/LN/FiLM op is
    one rows-times-bigger matmul/vector op; only the SDPA inner products
    run per (row, head) — or per head only with `batched` (rank-3 dots
    batched over rows). kh/vh: [rows, H, L, hd]; negs: [rows, 1, L]."""
    (kh, vh, wq, bq, wo, bo,
     wq2, bq2, wk2, bk2, wv2, bv2, wo2, bo2,
     w1, b1, w2, b2, g1, be1, g2, be2, g3, be3) = ops

    if batched:
        def cross_sdpa(q):
            return _sdpa_batched_rows(q, kh, vh, num_heads, rows, t, negs)

        def self_sdpa(q2, k2, v2):
            return _sdpa_batched_rows(q2, k2, v2, num_heads, rows, t, None)
    else:
        def per_row_sdpa(q, k_of_row, v_of_row, neg_of_row):
            outs = []
            for r in range(rows):
                outs.append(
                    _sdpa(
                        q[r * t:(r + 1) * t],
                        k_of_row(r),
                        v_of_row(r),
                        num_heads,
                        neg_of_row(r),
                    )
                )
            return jnp.concatenate(outs, axis=0) if rows > 1 else outs[0]

        def cross_sdpa(q):
            return per_row_sdpa(
                q, lambda r: kh[r], lambda r: vh[r], lambda r: negs[r]
            )

        def self_sdpa(q2, k2, v2):
            return per_row_sdpa(
                q2,
                lambda r: k2[r * t:(r + 1) * t],
                lambda r: v2[r * t:(r + 1) * t],
                lambda r: None,
            )

    x_pe = x + pe
    q = _dense(x_pe, wq, bq)
    att = cross_sdpa(q)
    x2 = _dense(att, wo, bo)
    x2 = _layer_norm(x2)
    x2 = x2 * g1 + be1 + x

    x2_pe = x2 + pe
    q2 = _dense(x2_pe, wq2, bq2)
    k2 = _dense(x2_pe, wk2, bk2)
    v2 = _dense(x2, wv2, bv2)
    att2 = self_sdpa(q2, k2, v2)
    x3 = _dense(att2, wo2, bo2)
    x3 = _layer_norm(x2 + x3)
    x3 = x3 * g2 + be2

    # FFN: SiLU -> fc1 -> SiLU -> fc2 (ops/basic.py FFN, act_before=True)
    h = _dense(_silu(x3), w1, b1)
    x4 = _dense(_silu(h), w2, b2)
    x4 = x4 + x3
    return _layer_norm(x4) * g3 + be3


def _make_kernel(num_layers, num_heads, rows, t8, batched=False):
    def kernel(*refs):
        x_ref, aw_ref, ab_ref, pe_ref, neg_ref = refs[:5]
        out_ref = refs[-1]
        cin = x_ref.shape[-1]
        x = _dense(x_ref[...].reshape(rows * t8, cin), aw_ref[:], ab_ref[:])
        pe = pe_ref[:]  # [rows*T8, D], pre-tiled
        negs = neg_ref[...]  # [rows, 1, L]
        for i in range(num_layers):
            vals = [r[:] for r in refs[5 + i * _PER_LAYER: 5 + (i + 1) * _PER_LAYER]]
            x = _encoder_layer(
                x, pe, negs, num_heads, rows, t8, tuple(vals), batched
            )
        out_ref[...] = x.reshape(rows, t8, x.shape[-1])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "rows", "interpret", "batched")
)
def fused_encoder_layer(
    x,  # [B, T, D] bf16
    pe,  # [T, D] stroke PE for this pyramid level
    neg_mask,  # [B, 1, L]
    layer_ops,  # _PER_LAYER operands (kh/vh [B, H, L, hd])
    num_heads: int,
    rows: int = 8,
    interpret: bool = False,
    batched: bool = False,
):
    """One EncoderLayer.attend as a single Pallas program (row-packed).

    Used for enc3 (T/2, d=c2, 3 heads) and enc5 (T/4, d=c3, 4 heads) on
    the sampler path — the T/4 megakernel experiment showed attention
    stacks are the profitable fusion unit while convs are not, so each
    EncoderLayer gets its own kernel and the ConvBlocks stay in XLA.
    """
    b, t, d = x.shape
    l = neg_mask.shape[-1]
    hd = layer_ops[0].shape[-1]
    assert b % rows == 0, (b, rows)

    pe_t = jnp.tile(pe, (rows, 1))

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    per_x = pl.BlockSpec((rows, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    per_kv = pl.BlockSpec(
        (rows, num_heads, l, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    per_neg = pl.BlockSpec((rows, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def kernel(*refs):
        x_ref, pe_ref, neg_ref = refs[:3]
        out_ref = refs[-1]
        vals = [r[:] for r in refs[3:3 + _PER_LAYER]]
        out = _encoder_layer(
            x_ref[...].reshape(rows * t, d), pe_ref[:], neg_ref[...],
            num_heads, rows, t, tuple(vals), batched,
        )
        out_ref[...] = out.reshape(rows, t, d)

    in_specs = [per_x, full, per_neg, per_kv, per_kv]
    in_specs += [full] * (_PER_LAYER - 2)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=per_x,
        interpret=interpret,
    )(x, pe_t, neg_mask, *layer_ops)


# ---------------------------------------------------------------------------
# Extended T/4 megakernel: enc4 ConvBlock + enc5 EncoderLayer + pool +
# att_dense + att_layers + upsample + skip_conv3 + dec3 ConvBlock, all in
# one program (the whole U-Net between the T/2 encoder and the T/2 decoder).
# ---------------------------------------------------------------------------

# ConvBlock operand order: wskip,bskip,w1,b1,w2,b2,wfc,bfc + 3 FiLM pairs
_PER_CONV = 14


def _conv3_packed(x3, w, b):
    """k3 'same' conv over [R, T, Cin] as three shifted matmuls (row
    boundaries zero-padded per row); w [3, Cin, Co]. One f32 rounding at
    the end, like XLA's bf16 conv."""
    r, t, cin = x3.shape
    co = w.shape[-1]
    zero = jnp.zeros_like(x3[:, :1])
    prev = jnp.concatenate([zero, x3[:, : t - 1]], axis=1).reshape(r * t, cin)
    mid = x3.reshape(r * t, cin)
    nxt = jnp.concatenate([x3[:, 1:], zero], axis=1).reshape(r * t, cin)

    def dot(a, wk):
        return jax.lax.dot_general(
            a, wk, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )

    out = dot(prev, w[0]) + dot(mid, w[1]) + dot(nxt, w[2]) + b.astype(F32)
    return out.astype(BF16).reshape(r, t, co)


def _conv_block_packed(x3, ops):
    """ConvBlock (dhg/ops/conv.py, dilation=1, no dropout) on packed rows."""
    (wskip, bskip, w1, b1, w2, b2, wfc, bfc,
     g1, be1, g2, be2, g3, be3) = ops
    r, t, _ = x3.shape
    skip = _conv3_packed(x3, wskip, bskip)
    h = _conv3_packed(_silu(x3), w1, b1)
    h = h * g1 + be1  # FiLM [1, C] broadcasts over [R, T, C]
    h = _conv3_packed(_silu(h), w2, b2)
    h = h * g2 + be2
    h2d = _dense(_silu(h).reshape(r * t, h.shape[-1]), wfc, bfc)
    h = h2d.reshape(r, t, h2d.shape[-1]) * g3 + be3
    return h + skip


def _avg_pool2_packed(x3):
    """[R, T, C] -> [R, T//2, C] window-2 mean (dhg.ops.conv.avg_pool_1d)."""
    r, t, c = x3.shape
    return x3.reshape(r, t // 2, 2, c).mean(axis=2).astype(x3.dtype)


def _upsample2_packed(x3):
    """[R, T, C] -> [R, 2T, C] nearest (dhg.ops.conv.upsample_nearest_1d)."""
    r, t, c = x3.shape
    return jnp.concatenate([x3[:, :, None], x3[:, :, None]], axis=2).reshape(
        r, 2 * t, c
    )


def _make_t4_kernel(num_layers, att_heads, enc5_heads, rows, t4, batched=False):
    t8 = t4 // 2

    def kernel(*refs):
        (x_ref, neg_ref, pe4_ref, pe8_ref,
         aw_ref, ab_ref, sk3w_ref, sk3b_ref) = refs[:8]
        out_ref = refs[-1]
        negs = neg_ref[...]
        base = 8

        enc4_ops = [r[:] for r in refs[base: base + _PER_CONV]]
        base += _PER_CONV
        enc5_ops = [r[:] for r in refs[base: base + _PER_LAYER]]
        base += _PER_LAYER
        dec3_ops = [r[:] for r in refs[base: base + _PER_CONV]]
        base += _PER_CONV

        # enc4 ConvBlock at T/4
        x3 = _conv_block_packed(x_ref[...], tuple(enc4_ops))
        c3 = x3.shape[-1]
        # enc5 EncoderLayer at T/4
        x2d = _encoder_layer(
            x3.reshape(rows * t4, c3), pe4_ref[:], negs, enc5_heads,
            rows, t4, tuple(enc5_ops), batched,
        )
        h3 = x2d.reshape(rows, t4, c3)

        # pool -> att_dense -> attention stack at T/8
        xb = _avg_pool2_packed(h3)
        x8 = _dense(xb.reshape(rows * t8, c3), aw_ref[:], ab_ref[:])
        for i in range(num_layers):
            ops = [r[:] for r in refs[base + i * _PER_LAYER: base + (i + 1) * _PER_LAYER]]
            x8 = _encoder_layer(
                x8, pe8_ref[:], negs, att_heads, rows, t8, tuple(ops), batched
            )
        d = x8.shape[-1]

        # upsample + skip_conv3 + dec3 ConvBlock back at T/4
        xu = _upsample2_packed(x8.reshape(rows, t8, d))
        skip = _conv3_packed(h3, sk3w_ref[:], sk3b_ref[:])
        out = _conv_block_packed(xu + skip, tuple(dec3_ops))
        out_ref[...] = out

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_layers", "att_heads", "enc5_heads", "rows", "interpret", "batched"
    ),
)
def fused_unet_t4(
    x,  # [B, T4, c2] bf16 (pooled h2)
    neg_mask,  # [B, 1, L]
    pe4,  # [T4, c3] enc5 stroke PE (pos_factor=2)
    pe8,  # [T8, D] bottleneck stroke PE (pos_factor=1)
    att_w, att_b,
    skip3_w, skip3_b,  # [3, c3, D], [D]
    enc4_ops,  # _PER_CONV operands
    enc5_ops,  # _PER_LAYER operands (kh/vh [B, H5, L, hd5])
    dec3_ops,  # _PER_CONV operands
    att_ops,  # num_layers * _PER_LAYER operands
    num_layers: int,
    att_heads: int = 6,
    enc5_heads: int = 4,
    rows: int = 4,
    interpret: bool = False,
    batched: bool = False,
):
    b, t4, c2 = x.shape
    c3 = skip3_w.shape[1]
    d = att_w.shape[-1]
    l = neg_mask.shape[-1]
    assert b % rows == 0, (b, rows)

    pe4_t = jnp.tile(pe4, (rows, 1))
    pe8_t = jnp.tile(pe8, (rows, 1))

    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def per(shape):
        n = len(shape)
        return pl.BlockSpec(
            (rows,) + shape, lambda i: (i,) + (0,) * n, memory_space=pltpu.VMEM
        )

    def kv_spec(heads, hd):
        return pl.BlockSpec(
            (rows, heads, l, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )

    hd5 = enc5_ops[0].shape[-1]
    hd8 = att_ops[0].shape[-1]

    in_specs = [per((t4, c2)), per((1, l)), full, full, full, full, full, full]
    in_specs += [full] * _PER_CONV
    in_specs += [kv_spec(enc5_heads, hd5), kv_spec(enc5_heads, hd5)]
    in_specs += [full] * (_PER_LAYER - 2)
    in_specs += [full] * _PER_CONV
    for _ in range(num_layers):
        in_specs += [kv_spec(att_heads, hd8), kv_spec(att_heads, hd8)]
        in_specs += [full] * (_PER_LAYER - 2)

    return pl.pallas_call(
        _make_t4_kernel(num_layers, att_heads, enc5_heads, rows, t4, batched),
        out_shape=jax.ShapeDtypeStruct((b, t4, c3), x.dtype),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=per((t4, c3)),
        interpret=interpret,
    )(
        x, neg_mask, pe4_t, pe8_t, att_w, att_b, skip3_w, skip3_b,
        *enc4_ops, *enc5_ops, *dec3_ops, *att_ops,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_layers", "num_heads", "rows", "interpret", "batched"),
)
def fused_bottleneck(
    x,  # [B, T8, Cin] bf16 (pooled h3)
    att_w, att_b,  # [Cin, D], [D]
    pe,  # [T8, D] positional embedding constant
    neg_mask,  # [B, 1, L] additive mask bias (mask * -1e9), bf16
    layer_ops,  # flat tuple, _PER_LAYER entries per layer
    num_layers: int,
    num_heads: int = 6,
    rows: int = 1,  # batch rows packed per grid cell (must divide B)
    interpret: bool = False,
    batched: bool = False,  # rank-3 row-batched SDPA dots (see _sdpa_batched_rows)
):
    b, t8, cin = x.shape
    d = att_w.shape[-1]
    l = neg_mask.shape[-1]
    hd = d // num_heads
    assert b % rows == 0, (b, rows)

    pe_tiled = jnp.tile(pe, (rows, 1))

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    per_x = pl.BlockSpec(
        (rows, t8, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    per_o = pl.BlockSpec((rows, t8, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    per_kv = pl.BlockSpec(
        (rows, num_heads, l, hd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    per_neg = pl.BlockSpec((rows, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [per_x, full, full, full, per_neg]
    for _ in range(num_layers):
        in_specs += [per_kv, per_kv] + [full] * (_PER_LAYER - 2)

    return pl.pallas_call(
        _make_kernel(num_layers, num_heads, rows, t8, batched),
        out_shape=jax.ShapeDtypeStruct((b, t8, d), x.dtype),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=per_o,
        interpret=interpret,
    )(x, att_w, att_b, pe_tiled, neg_mask, *layer_ops)

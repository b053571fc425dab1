"""Pallas TPU kernel: fused ConvBlock (3x k3-conv + FiLM affines + FC + skip).

The denoiser spends its time in ConvBlocks made of many small ops: SiLU,
three 3-tap convs, a Dense, and three FiLM affines (dhg/ops/conv.py). XLA
fuses the elementwise chains into the convs but still materializes every
conv output in HBM. This kernel keeps one batch row's activations resident
in VMEM end-to-end: a k3 'same' conv is computed as three shifted matmuls
(rows t-1, t, t+1 against the kernel taps), so the whole block is seven MXU
contractions with zero HBM round-trips in between.

Used behind DHG_FUSED_CONVBLOCK=1 (dhg.ops.conv routes through it with a
custom_vjp whose backward recomputes the jnp math). Only the dilation=1,
no-dropout configuration is supported — which is every ConvBlock in the
reference channel plan (cnn.py dils[0]==1 throughout, dropout 0.0 in the
best config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3(h, w, b):
    """k3 'same' conv over [T, Cin] as three shifted matmuls; w [3, Cin, Co]."""
    t = h.shape[0]
    zero = jnp.zeros((1, h.shape[1]), h.dtype)
    prev = jnp.concatenate([zero, h[: t - 1]], axis=0)
    nxt = jnp.concatenate([h[1:], zero], axis=0)
    out = (
        jax.lax.dot_general(prev, w[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + jax.lax.dot_general(h, w[1], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + jax.lax.dot_general(nxt, w[2], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    )
    return out + b


def _block_kernel(
    x_ref,
    wskip_ref, bskip_ref,
    w1_ref, b1_ref,
    w2_ref, b2_ref,
    wfc_ref, bfc_ref,
    g1_ref, be1_ref,
    g2_ref, be2_ref,
    g3_ref, be3_ref,
    o_ref,
):
    x = x_ref[0].astype(jnp.float32)  # [T, Cin]

    skip = _conv3(x, wskip_ref[:], bskip_ref[:])

    # FiLM refs are per-batch (1, 1, C) blocks (a [B, 1, C] layout keeps
    # Mosaic's sublane tiling happy; dynamic row indexing into [B, C]
    # cannot be proven 8-aligned).
    h = _conv3(jax.nn.silu(x), w1_ref[:], b1_ref[:])
    h = h * g1_ref[0, 0] + be1_ref[0, 0]

    h = _conv3(jax.nn.silu(h), w2_ref[:], b2_ref[:])
    h = h * g2_ref[0, 0] + be2_ref[0, 0]

    h = jax.lax.dot_general(
        jax.nn.silu(h), wfc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[:]
    h = h * g3_ref[0, 0] + be3_ref[0, 0]

    o_ref[0] = (h + skip).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv_block(
    x,  # [B, T, Cin]
    wskip, bskip,  # [3, Cin, Co], [Co]
    w1, b1,  # [3, Cin, Co//2], [Co//2]
    w2, b2,  # [3, Co//2, Co], [Co]
    wfc, bfc,  # [Co, Co], [Co]
    g1, be1,  # [B, Co//2] FiLM gamma/beta (precomputed from sigma_emb)
    g2, be2,  # [B, Co]
    g3, be3,  # [B, Co]
    interpret: bool = False,
):
    b, t, cin = x.shape
    co = wskip.shape[-1]

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    per_batch_x = pl.BlockSpec((1, t, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    per_batch_o = pl.BlockSpec((1, t, co), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def film(c):
        return pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    # [B, C] -> [B, 1, C] so per-batch blocks satisfy sublane tiling.
    g1, be1, g2, be2, g3, be3 = (a[:, None, :] for a in (g1, be1, g2, be2, g3, be3))

    return pl.pallas_call(
        _block_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, co), x.dtype),
        grid=(b,),
        in_specs=[
            per_batch_x,
            full, full,  # wskip, bskip
            full, full,  # w1, b1
            full, full,  # w2, b2
            full, full,  # wfc, bfc
            film(co // 2), film(co // 2),  # g1, be1
            film(co), film(co),  # g2, be2
            film(co), film(co),  # g3, be3
        ],
        out_specs=per_batch_o,
        interpret=interpret,
    )(x, wskip, bskip, w1, b1, w2, b2, wfc, bfc, g1, be1, g2, be2, g3, be3)


def conv_block_ref(x, wskip, bskip, w1, b1, w2, b2, wfc, bfc, g1, be1, g2, be2, g3, be3):
    """Pure-jnp reference with the kernel's exact math (shifted matmuls)."""

    def conv3(h, w, bias):
        zero = jnp.zeros_like(h[:, :1])
        prev = jnp.concatenate([zero, h[:, :-1]], axis=1)
        nxt = jnp.concatenate([h[:, 1:], zero], axis=1)
        return (
            jnp.einsum("btc,cd->btd", prev, w[0])
            + jnp.einsum("btc,cd->btd", h, w[1])
            + jnp.einsum("btc,cd->btd", nxt, w[2])
            + bias
        )

    xf = x.astype(jnp.float32)
    skip = conv3(xf, wskip, bskip)
    h = conv3(jax.nn.silu(xf), w1, b1) * g1[:, None, :] + be1[:, None, :]
    h = conv3(jax.nn.silu(h), w2, b2) * g2[:, None, :] + be2[:, None, :]
    h = (jnp.einsum("btc,cd->btd", jax.nn.silu(h), wfc) + bfc) * g3[:, None, :] + be3[
        :, None, :
    ]
    return (h + skip).astype(x.dtype)


@jax.custom_vjp
def conv_block_fused_op(x, wskip, bskip, w1, b1, w2, b2, wfc, bfc, g1, be1, g2, be2, g3, be3):
    """Fused forward (Pallas); backward recomputes through the jnp reference."""
    return fused_conv_block(
        x, wskip, bskip, w1, b1, w2, b2, wfc, bfc, g1, be1, g2, be2, g3, be3
    )


def _fwd(*args):
    return conv_block_fused_op(*args), args


def _bwd(res, gout):
    _, vjp = jax.vjp(conv_block_ref, *res)
    return vjp(gout)


conv_block_fused_op.defvjp(_fwd, _bwd)

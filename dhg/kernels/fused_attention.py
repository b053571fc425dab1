"""Pallas TPU kernel: fused scaled-dot-product attention.

One VMEM-resident kernel per (batch, head): logits = QK^T/sqrt(D) (MXU),
additive padding mask, fp32 softmax (VPU), PV (MXU) — no HBM round-trips for
the logits/weights intermediates, which is where XLA's unfused path spends
its HBM bandwidth at these sizes.

Shapes here are small (T <= 480, L = 50, D <= 64), so whole Q/K/V blocks fit
VMEM and no flash-style streaming is needed; the grid just walks B*H. Key
lengths are padded to a sublane multiple with masked-out columns.

Used behind a flag (dhg.ops.attention defaults to the jnp path, which XLA
fuses well at these sizes); numerics are validated against the jnp path in
tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]  # [Tq, D]
    k = k_ref[0]  # [Tk, D]
    v = v_ref[0]  # [Tk, D]
    mask = mask_ref[0]  # [1, Tk] — 1.0 on padded key positions

    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale + mask * -1e9  # broadcast [1, Tk] over rows

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    weights = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        weights.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,  # [B, H, Tq, D]
    k: jnp.ndarray,  # [B, H, Tk, D]
    v: jnp.ndarray,  # [B, H, Tk, D]
    mask: jnp.ndarray | None = None,  # [B, 1, 1, Tk], 1.0 = masked key
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, tq, d = q.shape
    tk = k.shape[2]

    # Pad key length to a sublane multiple; padded columns are masked out.
    tk_pad = _round_up(tk, 8)
    if mask is None:
        mask = jnp.zeros((b, 1, 1, tk), q.dtype)
    if tk_pad != tk:
        pad = [(0, 0), (0, 0), (0, tk_pad - tk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, 0), (0, tk_pad - tk)], constant_values=1.0)

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk_pad, d)
    vf = v.reshape(b * h, tk_pad, d)
    # Broadcast the per-batch mask over heads -> [B*H, 1, Tk].
    maskf = jnp.broadcast_to(mask.astype(jnp.float32), (b, h, 1, tk_pad)).reshape(
        b * h, 1, tk_pad
    )

    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, tq, d)

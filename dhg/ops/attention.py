"""Multi-head attention + sinusoidal positional embeddings.

Parity notes (paths in /root/reference/diffusion_handwriting_generation/):
  * PosEmbeddings (attention.py:6-23): freq = exp(arange(half) * -ln(10000)/(half-1)),
    phase scaled by pos_factor, concat(sin, cos), returns [1, T, dim].
  * scaled_dp_attn (attention.py:26-46): additive mask = mask * -1e9 where the
    mask flags PADDED key positions with 1.0.
  * MultiHeadAttention (attention.py:49-87): separate Wq/Wk/Wv/dense Linears,
    head split d_model // num_heads, softmax over keys.

TPU notes: the softmax runs in float32 regardless of compute dtype; the
QK^T and PV contractions are jnp.einsum so XLA maps them to the MXU. Shapes
here (T <= 480, L = 50) fit comfortably in VMEM so a flash decomposition is
unnecessary; dhg.kernels provides a fused Pallas path for the bottleneck
self-attention, enabled via use_pallas.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dhg.ops.init import torch_bias_init, torch_kernel_init


def pos_embeddings(
    length: int, dim: int, pos_factor: float = 1.0, dtype: Any = jnp.float32
) -> jnp.ndarray:
    """Sinusoidal positional embeddings, [1, length, dim]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    phase = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None, :] * pos_factor
    emb = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    return emb[None].astype(dtype)


def _sdpa_jnp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    depth = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(depth, q.dtype)
    )
    if mask is not None:
        logits = logits + (mask * -1e9).astype(logits.dtype)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)




def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d) + mask * -1e9) v over [B, H, T, D] tensors.

    Routes through the fused Pallas kernel when DHG_FUSED_ATTENTION=1 on
    TPU; gradients always flow through the jnp math (custom_vjp).
    """
    from dhg.kernels.runtime import use_fused_attention

    if use_fused_attention():
        return _sdpa_fused(q, k, v, mask)
    return _sdpa_jnp(q, k, v, mask)


@jax.custom_vjp
def _sdpa_fused(q, k, v, mask):
    from dhg.kernels.fused_attention import fused_attention

    return fused_attention(q, k, v, mask)


def _sdpa_fused_fwd(q, k, v, mask):
    return _sdpa_fused(q, k, v, mask), (q, k, v, mask)


def _sdpa_fused_bwd(res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _sdpa_jnp(q_, k_, v_, mask), q, k, v)
    dq, dk, dv = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dmask


_sdpa_fused.defvjp(_sdpa_fused_fwd, _sdpa_fused_bwd)


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections.

    setup-style so the key/value side can be precomputed standalone: the
    sampler hoists every cross-attention layer's (K, V) — which depend only
    on the per-step conditioning memory, never on x_t — out of the 60-step
    scan (see DiffusionModel.precompute_cross_kv). All call sites feed
    q/k/v of width d_model, so the torch-parity bias init bound
    (1/sqrt(fan_in), torch nn.Linear default) uses d_model.
    """

    d_model: int
    num_heads: int
    dtype: Any = None

    def setup(self):
        def mk():
            return nn.Dense(
                self.d_model,
                dtype=self.dtype,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(self.d_model),
            )

        self.wq = mk()
        self.wk = mk()
        self.wv = mk()
        self.dense = mk()

    def _split_heads(self, y: jnp.ndarray) -> jnp.ndarray:
        """[B, L, D] -> [B, H, L, hd].

        A transpose-free BTHD variant (reshape only, einsums absorbing the
        head dim) was built and measured in round 2: sampler device time
        was unchanged — the layout copies were already overlapped on DMA
        lanes — while the TRAIN step regressed 44% (the backward pass of
        the BTHD einsums materializes worse layouts). BHTD stays.
        """
        b = y.shape[0]
        depth = self.d_model // self.num_heads
        return y.reshape(b, -1, self.num_heads, depth).transpose(0, 2, 1, 3)

    def kv(self, k: jnp.ndarray, v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Project keys/values to heads: ([B,L,d], [B,L,d]) -> 2x [B,H,L,hd]."""
        return self._split_heads(self.wk(k)), self._split_heads(self.wv(v))

    def attend_kv(
        self,
        q: jnp.ndarray,
        kh: jnp.ndarray,
        vh: jnp.ndarray,
        mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Attention with pre-projected keys/values ([B,H,L,hd])."""
        b = q.shape[0]
        qh = self._split_heads(self.wq(q))
        out = scaled_dot_product_attention(qh, kh, vh, mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        return self.dense(out)

    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        kh, vh = self.kv(k, v)
        return self.attend_kv(q, kh, vh, mask)

"""Transformer encoder layer with text cross-attention + stroke self-attention.

Parity with the reference EncoderLayer (model.py:10-58):
  * text projection: SiLU -> Dense(d_inp -> d_out), then LayerNorm + affine;
  * sinusoidal PE added to Q and K only — V stays un-positioned
    (text PE factor 1.0; stroke PE factor = pos_factor per pyramid level);
  * cross-attention (stroke -> text, padding-masked) with residual;
  * self-attention over strokes (Q=K=x+PE, V=x);
  * FFN (hidden = 2*d_out) with residual;
  * every sublayer output passes through an AffineTransformLayer(sigma).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dhg.ops.attention import MultiHeadAttention, pos_embeddings
from dhg.ops.basic import AffineTransformLayer, FFN, dense, layer_norm


class EncoderLayer(nn.Module):
    d_out: int
    num_heads: int
    drop_rate: float = 0.1
    pos_factor: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = nn.Dropout(self.drop_rate, deterministic=deterministic)

        text = dense(self.d_out, text.shape[-1], self.dtype, name="text_dense")(
            nn.silu(text)
        )
        text = AffineTransformLayer(self.d_out, self.dtype, name="affine0")(
            layer_norm(text, self.dtype), sigma_emb
        )

        text_pe = text + pos_embeddings(text.shape[1], self.d_out, 1.0, text.dtype)
        stroke_pe = pos_embeddings(x.shape[1], self.d_out, self.pos_factor, x.dtype)
        x_pe = x + stroke_pe

        # Cross-attention: strokes query the text memory (V is un-positioned).
        x2 = MultiHeadAttention(self.d_out, self.num_heads, self.dtype, name="mha")(
            x_pe, text_pe, text, text_mask
        )
        x2 = layer_norm(drop(x2), self.dtype)
        x2 = AffineTransformLayer(self.d_out, self.dtype, name="affine1")(x2, sigma_emb) + x

        # Self-attention over strokes.
        x2_pe = x2 + stroke_pe
        x3 = MultiHeadAttention(self.d_out, self.num_heads, self.dtype, name="mha2")(
            x2_pe, x2_pe, x2
        )
        x3 = layer_norm(x2 + drop(x3), self.dtype)
        x3 = AffineTransformLayer(self.d_out, self.dtype, name="affine2")(x3, sigma_emb)

        x4 = FFN(self.d_out, hidden=self.d_out * 2, dtype=self.dtype, name="ffn")(x3)
        x4 = drop(x4) + x3
        return AffineTransformLayer(self.d_out, self.dtype, name="affine3")(
            layer_norm(x4, self.dtype), sigma_emb
        )

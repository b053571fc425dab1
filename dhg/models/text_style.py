"""Text-style conditioning encoder.

Builds the [B, max_text_len, d_model] conditioning memory consumed by every
EncoderLayer. Parity with the reference TextStyleEncoder (text_style.py:62-104):

  style [B, 14, 1280] -> dropout(0.3) -> reshape_up(5) -> [B, 70, 256]
        -> FFN(hidden=d_ff) -> LayerNorm -> affine1
  text  [B, L] -> Embedding(73, d_model) -> LayerNorm -> affine2
  cross-attn text -> style (8 heads, unmasked) + residual -> affine3(LN(.))
  FFN (hidden = 2*d_model) -> affine4(LN(.))
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dhg.ops.attention import MultiHeadAttention
from dhg.ops.basic import AffineTransformLayer, FFN, layer_norm, reshape_up
from dhg.ops.init import normal_embed_init

VOCAB_SIZE = 73  # tokenizer.py vocab: pad(0) + eos(1) + 71 chars


class TextStyleEncoder(nn.Module):
    d_model: int
    d_ff: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,
        style: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        style = nn.Dropout(0.3, deterministic=deterministic)(style)
        style = reshape_up(style, 5)  # [B, 14, 1280] -> [B, 70, 256]
        style = FFN(self.d_model, hidden=self.d_ff, dtype=self.dtype, name="style_ffn")(style)
        style = layer_norm(style, self.dtype)
        style = AffineTransformLayer(self.d_model, self.dtype, name="affine1")(style, sigma_emb)

        h = nn.Embed(
            VOCAB_SIZE,
            self.d_model,
            dtype=self.dtype,
            embedding_init=normal_embed_init,
            name="emb",
        )(text)
        h = layer_norm(h, self.dtype)
        h = AffineTransformLayer(self.d_model, self.dtype, name="affine2")(h, sigma_emb)

        attn = MultiHeadAttention(self.d_model, 8, self.dtype, name="mha")(h, style, style)
        h = AffineTransformLayer(self.d_model, self.dtype, name="affine3")(
            layer_norm(h + attn, self.dtype), sigma_emb
        )
        h = FFN(self.d_model, hidden=self.d_model * 2, dtype=self.dtype, name="text_ffn")(h)
        return AffineTransformLayer(self.d_model, self.dtype, name="affine4")(
            layer_norm(h, self.dtype), sigma_emb
        )

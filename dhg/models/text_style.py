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
    """setup-style, split into a sigma-independent `pre` (style FFN + text
    embedding, the FLOP-heavy half) and a sigma-dependent `tail`: the
    sampler runs `pre` ONCE per call and only `tail` per diffusion step
    (the reference recomputes everything per step, text_style.py:91-104 —
    numerically identical, __call__ is exactly tail(pre(...)))."""

    d_model: int
    d_ff: int = 512
    dtype: Any = None

    def setup(self):
        self.style_ffn = FFN(self.d_model, hidden=self.d_ff, dtype=self.dtype)
        self.affine1 = AffineTransformLayer(self.d_model, self.dtype)
        self.emb = nn.Embed(
            VOCAB_SIZE,
            self.d_model,
            dtype=self.dtype,
            embedding_init=normal_embed_init,
        )
        self.affine2 = AffineTransformLayer(self.d_model, self.dtype)
        self.mha = MultiHeadAttention(self.d_model, 8, self.dtype)
        self.affine3 = AffineTransformLayer(self.d_model, self.dtype)
        self.text_ffn = FFN(self.d_model, hidden=self.d_model * 2, dtype=self.dtype)
        self.affine4 = AffineTransformLayer(self.d_model, self.dtype)
        self.drop = nn.Dropout(0.3)

    def pre(
        self, text: jnp.ndarray, style: jnp.ndarray, deterministic: bool = True
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """sigma-independent half: (text_pre [B,L,d], style_pre [B,70,d])."""
        style = self.drop(style, deterministic=deterministic)
        style = reshape_up(style, 5)  # [B, 14, 1280] -> [B, 70, 256]
        style = layer_norm(self.style_ffn(style), self.dtype)
        h = layer_norm(self.emb(text), self.dtype)
        return h, style

    def tail(
        self,
        text_pre: jnp.ndarray,
        style_pre: jnp.ndarray,
        sigma_emb: jnp.ndarray,
    ) -> jnp.ndarray:
        """sigma-dependent half: affines + cross-attention + FFN."""
        style = self.affine1(style_pre, sigma_emb)
        h = self.affine2(text_pre, sigma_emb)
        attn = self.mha(h, style, style)
        h = self.affine3(layer_norm(h + attn, self.dtype), sigma_emb)
        h = self.text_ffn(h)
        return self.affine4(layer_norm(h, self.dtype), sigma_emb)

    def __call__(
        self,
        text: jnp.ndarray,
        style: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        text_pre, style_pre = self.pre(text, style, deterministic)
        return self.tail(text_pre, style_pre, sigma_emb)

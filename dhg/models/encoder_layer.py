"""Transformer encoder layer with text cross-attention + stroke self-attention.

Parity with the reference EncoderLayer (model.py:10-58):
  * text projection: SiLU -> Dense(d_inp -> d_out), then LayerNorm + affine;
  * sinusoidal PE added to Q and K only — V stays un-positioned
    (text PE factor 1.0; stroke PE factor = pos_factor per pyramid level);
  * cross-attention (stroke -> text, padding-masked) with residual;
  * self-attention over strokes (Q=K=x+PE, V=x);
  * FFN (hidden = 2*d_out) with residual;
  * every sublayer output passes through an AffineTransformLayer(sigma).

TPU-first structure: the layer is split into `text_kv` (everything that
depends only on the conditioning memory + sigma — text projection, LN,
affine, PE, and the cross-attention K/V head projections) and `attend`
(everything that depends on x_t). The sampler precomputes text_kv for all
60 diffusion steps in ONE batched pass outside the lax.scan, which removes
the whole text side of every cross-attention layer from the hot loop
(numerically identical — __call__ is exactly text_kv + attend).
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
    d_inp: int = 384  # conditioning-memory width (2*c2 in the denoiser)

    def setup(self):
        self.text_dense = dense(self.d_out, self.d_inp, self.dtype)
        self.affine0 = AffineTransformLayer(self.d_out, self.dtype)
        self.mha = MultiHeadAttention(self.d_out, self.num_heads, self.dtype)
        self.affine1 = AffineTransformLayer(self.d_out, self.dtype)
        self.mha2 = MultiHeadAttention(self.d_out, self.num_heads, self.dtype)
        self.affine2 = AffineTransformLayer(self.d_out, self.dtype)
        self.ffn = FFN(self.d_out, hidden=self.d_out * 2, dtype=self.dtype)
        self.affine3 = AffineTransformLayer(self.d_out, self.dtype)
        self.drop = nn.Dropout(self.drop_rate)

    def text_kv(
        self, text: jnp.ndarray, sigma_emb: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """x_t-independent half: conditioning memory -> cross-attn (K, V)."""
        text = self.text_dense(nn.silu(text))
        text = self.affine0(layer_norm(text, self.dtype), sigma_emb)
        text_pe = text + pos_embeddings(text.shape[1], self.d_out, 1.0, text.dtype)
        return self.mha.kv(text_pe, text)  # V is the un-positioned text

    def film_coeffs(self, sigma_emb: jnp.ndarray):
        """(gamma, beta) for the three x_t-side affines (affine0 lives on
        the text side, inside text_kv) — precomputable per diffusion step."""
        return (
            self.affine1.coefficients(sigma_emb),
            self.affine2.coefficients(sigma_emb),
            self.affine3.coefficients(sigma_emb),
        )

    def attend(
        self,
        x: jnp.ndarray,
        kv: tuple[jnp.ndarray, jnp.ndarray],
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
        coeffs=None,
    ) -> jnp.ndarray:
        """x_t-dependent half: cross-attn, self-attn, FFN."""
        if coeffs is None:
            coeffs = self.film_coeffs(sigma_emb)
        c1, c2, c3 = coeffs
        film = AffineTransformLayer.apply_coeffs
        kh, vh = kv
        stroke_pe = pos_embeddings(x.shape[1], self.d_out, self.pos_factor, x.dtype)

        # Cross-attention: strokes query the text memory.
        x2 = self.mha.attend_kv(x + stroke_pe, kh, vh, text_mask)
        x2 = layer_norm(self.drop(x2, deterministic=deterministic), self.dtype)
        x2 = film(x2, c1) + x

        # Self-attention over strokes.
        x2_pe = x2 + stroke_pe
        x3 = self.mha2(x2_pe, x2_pe, x2)
        x3 = layer_norm(x2 + self.drop(x3, deterministic=deterministic), self.dtype)
        x3 = film(x3, c2)

        x4 = self.ffn(x3)
        x4 = self.drop(x4, deterministic=deterministic) + x3
        return film(layer_norm(x4, self.dtype), c3)

    def __call__(
        self,
        x: jnp.ndarray,
        text: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self.attend(
            x, self.text_kv(text, sigma_emb), sigma_emb, text_mask, deterministic
        )

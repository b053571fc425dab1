"""The denoiser: a 1-D conv U-Net with text/style cross-attention.

Architecture parity with the reference DiffusionModel (model.py:61-182),
re-laid-out channel-last [B, T, C] end-to-end (no transposes — the
reference's [B,C,T] <-> [B,T,C] shuffles are a torch Conv1d artifact):

  input Dense(2 -> c1)
  enc1 ConvBlock(c1)                                   [B, T,   c1]
  pool/2 -> enc2 ConvBlock(c2) -> enc3 EncoderLayer(heads=3, pos_factor=4)
                                                        [B, T/2, c2]
  pool/2 -> enc4 ConvBlock(c3) -> enc5 EncoderLayer(heads=4, pos_factor=2)
                                                        [B, T/4, c3]
  pool/2 -> Dense(c3 -> 2*c2) -> N x EncoderLayer(heads=6)
                                                        [B, T/8, 2*c2]
  upsample x2 + k3-conv skip(h3) -> dec3 ConvBlock(c3)
  upsample x2 + k3-conv skip(h2) -> dec2 ConvBlock(c2)
  upsample x2 + k3-conv skip(h1) -> dec1 ConvBlock(c1)
  heads: Dense(c1 -> 2) noise prediction; Dense(c1 -> 1) + sigmoid pen lifts

sigma enters as sqrt(alpha_bar) [B, 1] (train.py:49, inference.py:89), is
embedded once by a SiLU-MLP with hidden 2048 into 32 dims (model.py:83), and
conditions all 23 affine layers.

Default channel plan (train.py:140-146): c1 = channels, c2 = channels*3//2,
c3 = channels*2 — i.e. 128/192/256, bottleneck width 384.

TPU-first structure: the forward is split into `embed_sigma` + `encode_cond`
(text/style conditioning memory) and `denoise` (the U-Net). Training uses
the fused __call__; the sampler precomputes (sigma_emb, cond) for ALL 60
diffusion steps in one batched pass and scans only over `denoise` — the
TextStyleEncoder never runs inside the sampling loop (numerically identical,
conditioning depends on sigma but not on x_t).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dhg.models.encoder_layer import EncoderLayer
from dhg.models.text_style import TextStyleEncoder
from dhg.ops.basic import FFN, create_padding_mask, dense
from dhg.ops.conv import ConvBlock, avg_pool_1d, conv1d_same, upsample_nearest_1d


class DiffusionModel(nn.Module):
    num_layers: int = 2
    c1: int = 128
    c2: int = 192
    c3: int = 256
    drop_rate: float = 0.0
    dtype: Any = None

    def setup(self):
        c1, c2, c3, dt = self.c1, self.c2, self.c3, self.dtype
        dr = self.drop_rate

        self.sigma_ffn = FFN(c1 // 4, hidden=2048, dtype=dt)
        self.text_style_model = TextStyleEncoder(c2 * 2, c2 * 4, dtype=dt)

        self.input_dense = dense(c1, 2, dt)
        self.enc1 = ConvBlock(c1, dilation=1, drop_rate=dr, dtype=dt)
        self.enc2 = ConvBlock(c2, dilation=1, drop_rate=dr, dtype=dt)
        self.enc3 = EncoderLayer(c2, 3, dr, pos_factor=4.0, dtype=dt)
        self.enc4 = ConvBlock(c3, dilation=1, drop_rate=dr, dtype=dt)
        self.enc5 = EncoderLayer(c3, 4, dr, pos_factor=2.0, dtype=dt)

        self.att_dense = dense(c2 * 2, c3, dt)
        # List entries auto-name as att_layers_<i> under setup.
        self.att_layers = [
            EncoderLayer(c2 * 2, 6, dr, dtype=dt) for i in range(self.num_layers)
        ]

        self.skip_conv1 = conv1d_same(c2, c1, dtype=dt)
        self.skip_conv2 = conv1d_same(c3, c2, dtype=dt)
        self.skip_conv3 = conv1d_same(c2 * 2, c3, dtype=dt)
        self.dec3 = ConvBlock(c3, dilation=1, drop_rate=dr, dtype=dt)
        self.dec2 = ConvBlock(c2, dilation=1, drop_rate=dr, dtype=dt)
        self.dec1 = ConvBlock(c1, dilation=1, drop_rate=dr, dtype=dt)

        self.output_dense = dense(2, c1, dt)
        self.pen_lifts_dense = dense(1, c1, dt)

    # -- conditioning (x_t-independent; hoistable out of the sampler loop) --

    def embed_sigma(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """[B, 1] sqrt(alpha_bar) -> [B, 32] embedding."""
        return self.sigma_ffn(sigma)

    def encode_cond(
        self,
        text: jnp.ndarray,
        style: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[B, L] tokens + [B, 14, 1280] style -> [B, L, 2*c2] memory."""
        return self.text_style_model(text, style, sigma_emb, deterministic)

    # -- the U-Net ----------------------------------------------------------

    def encode_unet(
        self,
        strokes: jnp.ndarray,
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Encoder half: x_t -> (h1 [B,T,c1], h2 [B,T/2,c2], h3 [B,T/4,c3]).

        Split out so the sampler's optional encoder-reuse mode (Li et al.,
        "Faster Diffusion", arXiv:2312.09608 — encoder features vary slowly
        across adjacent timesteps) can cache these between steps.
        """
        x = self.input_dense(strokes)
        h1 = self.enc1(x, sigma_emb, deterministic)
        h2 = avg_pool_1d(h1)
        h2 = self.enc2(h2, sigma_emb, deterministic)
        h2 = self.enc3(h2, cond, sigma_emb, text_mask, deterministic)
        h3 = avg_pool_1d(h2)
        h3 = self.enc4(h3, sigma_emb, deterministic)
        h3 = self.enc5(h3, cond, sigma_emb, text_mask, deterministic)
        return h1, h2, h3

    def decode_unet(
        self,
        feats: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Bottleneck + decoder half: (h1, h2, h3) -> (eps_pred, pen)."""
        h1, h2, h3 = feats
        x = avg_pool_1d(h3)
        x = self.att_dense(x)
        for layer in self.att_layers:
            x = layer(x, cond, sigma_emb, text_mask, deterministic)

        x = upsample_nearest_1d(x) + self.skip_conv3(h3)
        x = self.dec3(x, sigma_emb, deterministic)
        x = upsample_nearest_1d(x) + self.skip_conv2(h2)
        x = self.dec2(x, sigma_emb, deterministic)
        x = upsample_nearest_1d(x) + self.skip_conv1(h1)
        x = self.dec1(x, sigma_emb, deterministic)

        eps_pred = self.output_dense(x)
        pen = nn.sigmoid(self.pen_lifts_dense(x))[..., 0]
        # Heads return float32 for numerically stable losses/sampling.
        return eps_pred.astype(jnp.float32), pen.astype(jnp.float32)

    def denoise(
        self,
        strokes: jnp.ndarray,
        cond: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        text_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        feats = self.encode_unet(strokes, cond, sigma_emb, text_mask, deterministic)
        return self.decode_unet(feats, cond, sigma_emb, text_mask, deterministic)

    def __call__(
        self,
        strokes: jnp.ndarray,  # [B, T, 2], T % 8 == 0
        text: jnp.ndarray,  # [B, L] int tokens
        sigma: jnp.ndarray,  # [B, 1] = sqrt(alpha_bar)
        style: jnp.ndarray,  # [B, 14, 1280]
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        sigma_emb = self.embed_sigma(sigma)
        text_mask = create_padding_mask(text)
        cond = self.encode_cond(text, style, sigma_emb, deterministic)
        return self.denoise(strokes, cond, sigma_emb, text_mask, deterministic)

    @staticmethod
    def from_config(training_args, dtype: Any = None) -> "DiffusionModel":
        """Build with the reference channel plan (train.py:139-146)."""
        ch = training_args.get("channels", 128)
        return DiffusionModel(
            num_layers=training_args.get("att_layers_num", 2),
            c1=ch,
            c2=ch * 3 // 2,
            c3=ch * 2,
            drop_rate=training_args.get("dropout", 0.0) or 0.0,
            dtype=dtype,
        )

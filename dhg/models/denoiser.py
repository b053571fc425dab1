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

    @nn.compact
    def __call__(
        self,
        strokes: jnp.ndarray,  # [B, T, 2], T % 8 == 0
        text: jnp.ndarray,  # [B, L] int tokens
        sigma: jnp.ndarray,  # [B, 1] = sqrt(alpha_bar)
        style: jnp.ndarray,  # [B, 14, 1280]
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c1, c2, c3 = self.c1, self.c2, self.c3
        dt = self.dtype

        sigma_emb = FFN(c1 // 4, hidden=2048, dtype=dt, name="sigma_ffn")(sigma)
        text_mask = create_padding_mask(text)
        cond = TextStyleEncoder(c2 * 2, c2 * 4, dtype=dt, name="text_style_model")(
            text, style, sigma_emb, deterministic
        )

        x = dense(c1, 2, dt, name="input_dense")(strokes)

        h1 = ConvBlock(c1, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="enc1")(
            x, sigma_emb, deterministic
        )
        h2 = avg_pool_1d(h1)
        h2 = ConvBlock(c2, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="enc2")(
            h2, sigma_emb, deterministic
        )
        h2 = EncoderLayer(c2, 3, self.drop_rate, pos_factor=4.0, dtype=dt, name="enc3")(
            h2, cond, sigma_emb, text_mask, deterministic
        )
        h3 = avg_pool_1d(h2)
        h3 = ConvBlock(c3, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="enc4")(
            h3, sigma_emb, deterministic
        )
        h3 = EncoderLayer(c3, 4, self.drop_rate, pos_factor=2.0, dtype=dt, name="enc5")(
            h3, cond, sigma_emb, text_mask, deterministic
        )

        x = avg_pool_1d(h3)
        x = dense(c2 * 2, c3, dt, name="att_dense")(x)
        for i in range(self.num_layers):
            x = EncoderLayer(
                c2 * 2, 6, self.drop_rate, dtype=dt, name=f"att_layers_{i}"
            )(x, cond, sigma_emb, text_mask, deterministic)

        x = upsample_nearest_1d(x) + conv1d_same(c2 * 2, c3, dtype=dt, name="skip_conv3")(h3)
        x = ConvBlock(c3, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="dec3")(
            x, sigma_emb, deterministic
        )
        x = upsample_nearest_1d(x) + conv1d_same(c3, c2, dtype=dt, name="skip_conv2")(h2)
        x = ConvBlock(c2, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="dec2")(
            x, sigma_emb, deterministic
        )
        x = upsample_nearest_1d(x) + conv1d_same(c2, c1, dtype=dt, name="skip_conv1")(h1)
        x = ConvBlock(c1, dilation=1, drop_rate=self.drop_rate, dtype=dt, name="dec1")(
            x, sigma_emb, deterministic
        )

        eps_pred = dense(2, c1, dt, name="output_dense")(x)
        pen = nn.sigmoid(dense(1, c1, dt, name="pen_lifts_dense")(x))[..., 0]
        # Heads return float32 for numerically stable losses/sampling.
        return eps_pred.astype(jnp.float32), pen.astype(jnp.float32)

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

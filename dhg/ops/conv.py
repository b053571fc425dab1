"""1-D conv blocks, pooling and upsampling — all channel-last [B, T, C].

The reference works in torch's [B, C, T] and transposes around every affine
layer (cnn.py:52-87, model.py:139-179). Here everything stays [B, T, C]: XLA
maps lax.conv_general_dilated with NWC/WIO layouts straight onto the MXU and
fuses the SiLU/FiLM elementwise chains, so no layout shuffles survive
compilation.

Parity notes:
  * ConvBlock (cnn.py:6-87): skip = k3 conv; main = SiLU -> k3 conv(d_out/2)
    -> affine -> SiLU -> k3 conv(d_out) -> affine -> SiLU -> Dense -> affine
    -> + skip. QUIRK preserved: both convs use dilation dils[0]; dils[1] is
    accepted but unused (cnn.py:33-47).
  * pool = AvgPool1d(2), upsample = nearest x2 (model.py:93-94).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dhg.ops.basic import AffineTransformLayer, dense
from dhg.ops.init import torch_bias_init, torch_kernel_init


def conv1d_same(
    features: int,
    in_features: int,
    kernel_size: int = 3,
    dilation: int = 1,
    dtype: Any = None,
    name: str | None = None,
):
    """k-tap 'same' Conv over [B, T, C] with torch-default init."""
    return nn.Conv(
        features,
        kernel_size=(kernel_size,),
        padding="SAME",
        kernel_dilation=(dilation,),
        dtype=dtype,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_features * kernel_size),
        name=name,
    )


def avg_pool_1d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """[B, T, C] -> [B, T//window, C] mean pooling (torch AvgPool1d parity)."""
    b, t, c = x.shape
    return x.reshape(b, t // window, window, c).mean(axis=2)


def upsample_nearest_1d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B, T, C] -> [B, T*factor, C] nearest-neighbor upsample."""
    return jnp.repeat(x, factor, axis=1)


class ConvBlock(nn.Module):
    """Residual conv block with FiLM sigma conditioning."""

    d_out: int
    dilation: int = 1  # = dils[0] in the reference; dils[1] was never used
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, sigma_emb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        d_in = x.shape[-1]
        drop = nn.Dropout(self.drop_rate, deterministic=deterministic)

        skip = conv1d_same(self.d_out, d_in, dtype=self.dtype, name="conv_skip")(x)

        h = conv1d_same(
            self.d_out // 2, d_in, dilation=self.dilation, dtype=self.dtype, name="conv1"
        )(nn.silu(x))
        h = drop(AffineTransformLayer(self.d_out // 2, self.dtype, name="affine1")(h, sigma_emb))

        h = conv1d_same(
            self.d_out, self.d_out // 2, dilation=self.dilation, dtype=self.dtype, name="conv2"
        )(nn.silu(h))
        h = drop(AffineTransformLayer(self.d_out, self.dtype, name="affine2")(h, sigma_emb))

        h = dense(self.d_out, self.d_out, self.dtype, name="fc")(nn.silu(h))
        h = drop(AffineTransformLayer(self.d_out, self.dtype, name="affine3")(h, sigma_emb))

        return h + skip

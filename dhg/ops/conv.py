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
import jax
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
    """Residual conv block with FiLM sigma conditioning.

    setup-style so the fused Pallas path (DHG_FUSED_CONVBLOCK=1) can read
    the conv/fc weights and FiLM coefficients without running the unfused
    graph. Param tree names are identical to the original compact layout
    (conv_skip/conv1/conv2/fc/affine1-3).
    """

    d_out: int
    dilation: int = 1  # = dils[0] in the reference; dils[1] was never used
    drop_rate: float = 0.0
    dtype: Any = None

    def setup(self):
        # in_features for the torch-style bias init is only known at call
        # time; flax infers kernel shapes lazily, and the bias bound uses
        # d_out-based fan-in approximations identical to the previous
        # inline construction for the fc layer. Convs get their exact
        # fan-in via the _bias_fan_in trick below.
        self.conv_skip = _LazyConv(self.d_out, 1, self.dtype)
        self.conv1 = _LazyConv(self.d_out // 2, self.dilation, self.dtype)
        self.conv2 = _LazyConv(self.d_out, self.dilation, self.dtype)
        self.fc = dense(self.d_out, self.d_out, self.dtype)
        self.affine1 = AffineTransformLayer(self.d_out // 2, self.dtype)
        self.affine2 = AffineTransformLayer(self.d_out, self.dtype)
        self.affine3 = AffineTransformLayer(self.d_out, self.dtype)
        self.drop = nn.Dropout(self.drop_rate)

    def film_coeffs(self, sigma_emb: jnp.ndarray):
        """(gamma, beta) for all three FiLM affines — x_t-independent, so the
        sampler precomputes them for all 60 steps outside its scan."""
        return (
            self.affine1.coefficients(sigma_emb),
            self.affine2.coefficients(sigma_emb),
            self.affine3.coefficients(sigma_emb),
        )

    def _unfused(self, x, coeffs, deterministic):
        c1, c2, c3 = coeffs
        film = AffineTransformLayer.apply_coeffs
        skip = self.conv_skip(x)
        h = self.conv1(nn.silu(x))
        h = self.drop(film(h, c1), deterministic=deterministic)
        h = self.conv2(nn.silu(h))
        h = self.drop(film(h, c2), deterministic=deterministic)
        h = self.fc(nn.silu(h))
        h = self.drop(film(h, c3), deterministic=deterministic)
        return h + skip

    def __call__(
        self,
        x: jnp.ndarray,
        sigma_emb: jnp.ndarray,
        deterministic: bool = True,
        coeffs=None,
    ) -> jnp.ndarray:
        from dhg.kernels.runtime import use_fused_conv_block

        if coeffs is None:
            coeffs = self.film_coeffs(sigma_emb)

        fused_ok = (
            not self.is_initializing()
            and use_fused_conv_block()
            and self.dilation == 1
            and (self.drop_rate == 0.0 or deterministic)
        )
        if not fused_ok:
            return self._unfused(x, coeffs, deterministic)

        from dhg.kernels.fused_conv_block import conv_block_fused_op

        (g1, be1), (g2, be2), (g3, be3) = coeffs

        def wb(mod):
            p = mod.variables["params"]
            return p["kernel"], p["bias"]

        wskip, bskip = wb(self.conv_skip)
        w1, b1 = wb(self.conv1)
        w2, b2 = wb(self.conv2)
        wfc, bfc = wb(self.fc)
        return conv_block_fused_op(
            x, wskip, bskip, w1, b1, w2, b2, wfc, bfc, g1, be1, g2, be2, g3, be3
        )


class _LazyConv(nn.Module):
    """k3 'same' Conv with torch-style init, fan-in resolved at first call.

    Wrapper so ConvBlock's setup() can declare convs without knowing the
    input width; the inner nn.Conv is named 'conv'... no — it must own the
    params directly to keep the conv_skip/kernel naming. Uses nn.compact
    with explicit param declaration mirroring nn.Conv's shapes.
    """

    features: int
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (3, d_in, self.features))
        bias = self.param("bias", torch_bias_init(d_in * 3), (self.features,))
        dt = self.dtype or x.dtype
        out = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=(1,),
            padding="SAME",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(dt)

"""Basic blocks: FiLM affine conditioning, SiLU FFN, LayerNorm, masks, reshapes.

Parity notes (file:line refer to /root/reference/diffusion_handwriting_generation/):
  * AffineTransformLayer (conditioning.py:5-19): x * Dense_g(sigma) + Dense_b(sigma),
    gamma bias initialized to 1.0, sigma embedding width fixed at 32 (= c1 // 4).
  * ff_network (utils/nn.py:145-175): [SiLU] -> Dense(hidden) -> SiLU -> Dense(out).
  * LayerNorm: eps=1e-6, no learned scale/bias (model.py:25, text_style.py:80).
  * create_padding_mask (utils/nn.py:178-191): (token == 0) as float, [B,1,1,L].
  * reshape_up/down (utils/nn.py:115-142).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dhg.ops.init import torch_bias_init, torch_kernel_init

SIGMA_EMB_DIM = 32  # width of the sigma embedding consumed by every affine layer


def dense(features: int, in_features: int, dtype: Any = None, name: str | None = None):
    """Dense layer with torch-default init (needs fan_in for the bias)."""
    return nn.Dense(
        features,
        dtype=dtype,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_features),
        name=name,
    )


def layer_norm(x: jnp.ndarray, dtype: Any = None, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm(eps=1e-6) without learned affine, as a pure function.

    Bit-identical to flax nn.LayerNorm(use_bias=False, use_scale=False,
    dtype=dtype) — float32 statistics with the fast-variance formula
    max(0, E[x^2] - E[x]^2), normalization of the un-promoted input, result
    cast back to `dtype` (or the input dtype). Pure so it can be called from
    non-compact module methods (tests/test_model.py pins the equivalence).
    """
    stat_dtype = jnp.promote_types(dtype if dtype is not None else x.dtype, jnp.float32)
    xf = x.astype(stat_dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(dtype if dtype is not None else x.dtype)


class AffineTransformLayer(nn.Module):
    """FiLM conditioning: x * gamma(sigma_emb) + beta(sigma_emb).

    sigma_emb: [B, SIGMA_EMB_DIM]; broadcasts over the time axis of x [B, T, C].
    setup-style so `coefficients` can be called standalone (the fused Pallas
    ConvBlock precomputes gamma/beta outside the kernel).
    """

    hidden: int
    dtype: Any = None

    def setup(self):
        self.gamma_emb = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=nn.initializers.ones,  # TF/torch parity (conditioning.py:13)
        )
        self.beta_emb = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(SIGMA_EMB_DIM),
        )

    def coefficients(self, sigma_emb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(gamma [B, C], beta [B, C]) for a sigma embedding."""
        return self.gamma_emb(sigma_emb), self.beta_emb(sigma_emb)

    @staticmethod
    def apply_coeffs(
        x: jnp.ndarray, coeffs: tuple[jnp.ndarray, jnp.ndarray]
    ) -> jnp.ndarray:
        """FiLM with precomputed (gamma, beta) — the sampler hoists the
        coefficient Denses for all 60 steps out of its scan."""
        gamma, beta = coeffs
        return x * gamma[:, None, :] + beta[:, None, :]

    def __call__(self, x: jnp.ndarray, sigma_emb: jnp.ndarray) -> jnp.ndarray:
        return self.apply_coeffs(x, self.coefficients(sigma_emb))


class FFN(nn.Module):
    """SiLU feedforward: [SiLU] -> Dense(hidden) -> SiLU -> Dense(out)."""

    out: int
    hidden: int = 768
    act_before: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.act_before:
            x = nn.silu(x)
        x = dense(self.hidden, in_features, self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = dense(self.out, self.hidden, self.dtype, name="fc2")(x)
        return x


def create_padding_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """Mask of padded (id 0) positions: [B, L] int -> [B, 1, 1, L] float {0,1}."""
    return (tokens == 0).astype(jnp.float32)[:, None, None, :]


def reshape_up(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B, L, C] -> [B, L*factor, C//factor]."""
    b, l, c = x.shape
    return x.reshape(b, l * factor, c // factor)


def reshape_down(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B, L, C] -> [B, L//factor, C*factor]."""
    b, l, c = x.shape
    return x.reshape(b, l // factor, c * factor)

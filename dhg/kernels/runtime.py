"""Kernel backend selection.

The jnp attention path is the default (XLA fuses it well at these model
sizes). Set DHG_FUSED_ATTENTION=1 to route MultiHeadAttention through the
Pallas kernel on TPU; it is used for the forward pass, with gradients
flowing through an identical-math jnp recompute (custom_vjp), so the flag is
safe for both the sampler and the train step.
"""

from __future__ import annotations

import os

import jax


def use_fused_attention() -> bool:
    if os.environ.get("DHG_FUSED_ATTENTION", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_fused_bottleneck() -> bool:
    """Route the sampler's attention-bottleneck stack (att_dense + N
    EncoderLayers at T/8) through the fused Pallas megakernel (TPU only)."""
    if os.environ.get("DHG_FUSED_BOTTLENECK", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_fused_conv_block() -> bool:
    """Route ConvBlock through the fused Pallas kernel (TPU only)."""
    if os.environ.get("DHG_FUSED_CONVBLOCK", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False

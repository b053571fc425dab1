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


def fused_bottleneck_mode() -> str:
    """Sampler attention-bottleneck megakernel mode: "off" | "on" | "auto".

    Default "auto" enables the kernel on TPU for the canonical bottleneck
    width (d=384, measured +19%/+14% sampler throughput at batch 96/256 —
    PERFORMANCE.md); DHG_FUSED_BOTTLENECK=1 forces it for any shape,
    =0 disables.
    """
    v = os.environ.get("DHG_FUSED_BOTTLENECK", "auto")
    if v == "0":
        return "off"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return "off"
    if not on_tpu:
        return "off"
    return "on" if v == "1" else "auto"


def sdpa_batched() -> bool:
    """Rank-3 row-batched SDPA dots inside the fused Pallas kernels
    (dhg/kernels/fused_bottleneck.py::_sdpa_batched_rows): 2*H batched
    dots per attention instead of 2*rows*H rank-2 dots. Bit-identical to
    the per-(row,head) loop on TPU hardware (A/B maxdiff 0.0) but a
    measured NEGATIVE in the sampler: 36.9k vs 40.0k steps/s at batch 96,
    47.8k vs 49.2k at 256, compact hoist — Mosaic's batched-dot lowering
    pipelines worse in-scan than the unrolled per-row dots, even though a
    STANDALONE per-call microbench shows the opposite by 10x (that bench
    is dominated by per-dispatch program overhead, which scales with the
    unrolled variant's instruction count and is paid once, not per call,
    inside the sampler's scan — see DEVNOTES measurement lessons).
    Default off; DHG_SDPA_BATCHED=1 opts in for A/B."""
    return os.environ.get("DHG_SDPA_BATCHED", "0") == "1"


def fused_t4_mode() -> str:
    """Extended T/4 U-Net megakernel (enc4+enc5+bottleneck+skip3+dec3 in
    one program): "off" | "on". DEFAULT OFF — measured SLOWER than the
    bottleneck-only kernel at both rows=4 and rows=8 packing (batch 96:
    2.82 vs 2.57 ms/step; batch 256: 40.3k vs 46.8k steps/s — the
    shifted-matmul convs and extra VMEM traffic inside one cell lose to
    Mosaic/XLA's own scheduling of those stages; PERFORMANCE.md). Kept
    as a tested, opt-in (DHG_FUSED_T4=1) negative result and template."""
    if os.environ.get("DHG_FUSED_T4", "0") != "1":
        return "off"
    try:
        return "on" if jax.default_backend() == "tpu" else "off"
    except Exception:  # pragma: no cover
        return "off"


def use_fused_conv_block() -> bool:
    """Route ConvBlock through the fused Pallas kernel (TPU only)."""
    if os.environ.get("DHG_FUSED_CONVBLOCK", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False

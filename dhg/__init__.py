"""dhg — TPU-native diffusion handwriting generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sleep3r/Diffusion-Handwriting-Generation.pytorch (a PyTorch port of
Luhman & Luhman, "Diffusion models for handwriting generation",
arXiv:2011.06704).

Layer map (mirrors the reference's six logical layers, re-architected
TPU-first — single [B, T, C] layout, jitted train step, lax.scan sampler,
pjit data/tensor parallelism over a device mesh):

  dhg.config     — YAML config system (base.yml inheritance, dotted CLI overrides)
  dhg.data       — IAM-OnDB stroke/text/image pipeline + tokenizer + packed cache
  dhg.ops        — neural net building blocks (affine/FiLM, FFN, attention, conv)
  dhg.models     — denoiser, text-style encoder, MobileNetV2 style extractor
  dhg.core       — diffusion schedule, losses, samplers (pure jnp)
  dhg.kernels    — Pallas TPU kernels for the hot ops
  dhg.parallel   — device mesh + sharding rules (dp/tp via NamedSharding)
  dhg.train      — jitted/pjit training loop
  dhg.inference  — one-XLA-program 60-step sampler + CLI
  dhg.utils      — experiment harness, logging, rendering
"""

__version__ = "0.1.0"

from dhg.models.denoiser import DiffusionModel  # noqa: F401

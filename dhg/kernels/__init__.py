from dhg.kernels.fused_attention import fused_attention  # noqa: F401

# NOTE: no `from dhg.kernels.fused_attention import fused_attention` here —
# that would shadow the submodule with the same-named function on the
# package object (`import dhg.kernels.fused_attention as m` would then bind
# the function). Import from the submodule directly:
#   from dhg.kernels.fused_attention import fused_attention

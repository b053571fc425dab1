"""MobileNetV2 feature trunk in Flax (NHWC), torchvision-layout compatible.

The reference uses torchvision's pretrained MobileNetV2 `features` trunk as a
frozen style-image encoder (text_style.py:11-59). This is an independent NHWC
implementation of the same architecture (Sandler et al., arXiv:1801.04381):

  Conv 3x3 s2 -> 32 | inverted residual stages (t,c,n,s):
  (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1) (6,160,3,2)
  (6,320,1,1) | Conv 1x1 -> 1280, all BN + ReLU6.

Padding is torch-style explicit ((k-1)//2 per side) rather than XLA "SAME",
so spatial outputs are bit-compatible with torchvision and converted weights
reproduce the reference features exactly. BatchNorm always runs in inference
mode off stored running stats (the reference forces eval-mode BN,
text_style.py:29-37).

Weights: `dhg/tools/convert_torchvision_mnv2.py` converts a torchvision
state_dict to this module's .npz; without one (this environment has no
network egress) the trunk is deterministically random-initialized — still a
valid frozen writer-signature encoder, documented divergence from pretrained
features.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# (expansion t, out channels c, repeats n, first stride s)
INVERTED_RESIDUAL_SETTINGS: Sequence[tuple[int, int, int, int]] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _bn(dtype, name):
    return nn.BatchNorm(
        use_running_average=True, epsilon=1e-5, momentum=0.9, dtype=dtype, name=name
    )


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = _bn(self.dtype, "bn")(x)
        return jnp.clip(x, 0.0, 6.0)  # ReLU6


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_res = self.stride == 1 and in_ch == self.out_ch

        h = x
        if self.expand != 1:
            h = ConvBNReLU(hidden, kernel=1, dtype=self.dtype, name="expand")(h)
        # Depthwise 3x3.
        h = ConvBNReLU(
            hidden, kernel=3, stride=self.stride, groups=hidden, dtype=self.dtype, name="dw"
        )(h)
        # Linear projection (no activation).
        h = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project"
        )(h)
        h = _bn(self.dtype, "project_bn")(h)
        return x + h if use_res else h


class MobileNetV2Features(nn.Module):
    """The `features` trunk: [B, H, W, 3] -> [B, H/32, W/32, 1280]."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(32, kernel=3, stride=2, dtype=self.dtype, name="stem")(x)
        for stage, (t, c, n, s) in enumerate(INVERTED_RESIDUAL_SETTINGS):
            for i in range(n):
                x = InvertedResidual(
                    c,
                    stride=s if i == 0 else 1,
                    expand=t,
                    dtype=self.dtype,
                    name=f"block_{stage}_{i}",
                )(x)
        x = ConvBNReLU(1280, kernel=1, dtype=self.dtype, name="head")(x)
        return x

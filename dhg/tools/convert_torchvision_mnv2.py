"""Offline converter: torchvision MobileNetV2 state_dict -> dhg .npz.

Usage (on a machine with torchvision / a downloaded checkpoint):

    python -m dhg.tools.convert_torchvision_mnv2 \
        --src mobilenet_v2-b0353104.pth --dst data/mobilenetv2_tv.npz

Maps torchvision's `features.*` parameter names onto the
dhg.models.mobilenetv2 module tree (stem / block_<stage>_<i> / head), with:
  * Conv weights NCHW [out, in, kh, kw] -> HWIO [kh, kw, in, out];
  * depthwise convs [ch, 1, kh, kw] -> [kh, kw, 1, ch];
  * BN {weight, bias, running_mean, running_var} -> flax BatchNorm
    {scale, bias} in 'params' and {mean, var} in 'batch_stats'.

The resulting .npz is loaded by init_style_extractor(weights_path=...).
This file has no torchvision dependency: it reads the raw state_dict via
torch.load (torch CPU is available) or a pre-exported .npz of tensors.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from dhg.models.mobilenetv2 import INVERTED_RESIDUAL_SETTINGS


def _conv_w(w: np.ndarray, depthwise: bool = False) -> np.ndarray:
    # torch [out, in/groups, kh, kw] -> flax HWIO [kh, kw, in/groups, out]
    return np.transpose(w, (2, 3, 1, 0))


def _emit_convbn(out: dict, tv: dict, tv_prefix: str, flax_prefix: str) -> None:
    """torchvision ConvBNReLU (0=conv, 1=bn) -> dhg ConvBNReLU (conv, bn)."""
    out[f"params/{flax_prefix}/conv/kernel"] = _conv_w(np.asarray(tv[f"{tv_prefix}.0.weight"]))
    out[f"params/{flax_prefix}/bn/scale"] = np.asarray(tv[f"{tv_prefix}.1.weight"])
    out[f"params/{flax_prefix}/bn/bias"] = np.asarray(tv[f"{tv_prefix}.1.bias"])
    out[f"batch_stats/{flax_prefix}/bn/mean"] = np.asarray(tv[f"{tv_prefix}.1.running_mean"])
    out[f"batch_stats/{flax_prefix}/bn/var"] = np.asarray(tv[f"{tv_prefix}.1.running_var"])


def convert(state_dict: dict) -> dict:
    """torchvision mobilenet_v2 state_dict -> flat {path: array} for dhg."""
    tv = {k: v for k, v in state_dict.items() if k.startswith("features.")}
    out: dict[str, np.ndarray] = {}
    mnv2 = "mobilenet"

    _emit_convbn(out, tv, "features.0", f"{mnv2}/stem")

    feat_idx = 1
    for stage, (t, c, n, s) in enumerate(INVERTED_RESIDUAL_SETTINGS):
        for i in range(n):
            blk = f"features.{feat_idx}.conv"
            fx = f"{mnv2}/block_{stage}_{i}"
            if t == 1:
                # conv.0 = depthwise ConvBNReLU, conv.1 = project, conv.2 = bn
                _emit_convbn(out, tv, f"{blk}.0", f"{fx}/dw")
                proj_w, proj_bn = f"{blk}.1", f"{blk}.2"
            else:
                _emit_convbn(out, tv, f"{blk}.0", f"{fx}/expand")
                _emit_convbn(out, tv, f"{blk}.1", f"{fx}/dw")
                proj_w, proj_bn = f"{blk}.2", f"{blk}.3"
            out[f"params/{fx}/project/kernel"] = _conv_w(np.asarray(tv[f"{proj_w}.weight"]))
            out[f"params/{fx}/project_bn/scale"] = np.asarray(tv[f"{proj_bn}.weight"])
            out[f"params/{fx}/project_bn/bias"] = np.asarray(tv[f"{proj_bn}.bias"])
            out[f"batch_stats/{fx}/project_bn/mean"] = np.asarray(
                tv[f"{proj_bn}.running_mean"]
            )
            out[f"batch_stats/{fx}/project_bn/var"] = np.asarray(tv[f"{proj_bn}.running_var"])
            feat_idx += 1

    _emit_convbn(out, tv, f"features.{feat_idx}", f"{mnv2}/head")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".pth state_dict or .npz of tensors")
    ap.add_argument("--dst", default="data/mobilenetv2_tv.npz")
    args = ap.parse_args()

    src = Path(args.src)
    if src.suffix == ".npz":
        state_dict = dict(np.load(src))
    else:
        import torch

        state_dict = {
            k: v.numpy() for k, v in torch.load(src, map_location="cpu").items()
        }

    out = convert(state_dict)
    np.savez_compressed(args.dst, **out)
    print(f"wrote {args.dst} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

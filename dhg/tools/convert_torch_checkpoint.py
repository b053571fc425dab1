"""Convert a reference PyTorch checkpoint (.pth) into dhg params.

Usage:
    python -m dhg.tools.convert_torch_checkpoint \
        --src model_final.pth --dst data/converted/model_final

Maps the reference DiffusionModel state_dict (model.py:61-119 naming) onto
the dhg param tree:
  * Linear:   weight [out, in]      -> Dense kernel [in, out] (transpose)
  * Conv1d:   weight [out, in, kw]  -> Conv kernel [kw, in, out]
  * Embedding: identical layout
  * ff_network Sequential indices (utils/nn.py:165-175): with act_before,
    .1 -> fc1, .3 -> fc2; TextStyleEncoder FFNs likewise
  * MultiHeadAttention wq/wk/wv/dense; AffineTransformLayer gamma/beta_emb
  * pen_lifts_dense.0 (Sequential[Linear, Sigmoid]) -> pen_lifts_dense

Together with the weight-transplant primitive parity tests
(tests/test_torch_parity.py), this gives numerical parity against any
locally-trained reference checkpoint — the shipped pretrained weights are
absent from the reference mount (BASELINE.md note).
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np


def _lin(sd, key):
    """torch Linear at `key` -> {'kernel', 'bias'} (transpose weight)."""
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{key}.weight"]).T)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _conv(sd, key):
    """torch Conv1d [out, in, kw] -> flax [kw, in, out]."""
    w = np.asarray(sd[f"{key}.weight"]).transpose(2, 1, 0)
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _ffn(sd, key, act_before: bool = True):
    """ff_network Sequential -> {'fc1', 'fc2'} (utils/nn.py:165-175)."""
    i1, i2 = (1, 3) if act_before else (0, 2)
    return {"fc1": _lin(sd, f"{key}.{i1}"), "fc2": _lin(sd, f"{key}.{i2}")}


def _affine(sd, key):
    return {"gamma_emb": _lin(sd, f"{key}.gamma_emb"), "beta_emb": _lin(sd, f"{key}.beta_emb")}


def _mha(sd, key):
    return {
        "wq": _lin(sd, f"{key}.wq"),
        "wk": _lin(sd, f"{key}.wk"),
        "wv": _lin(sd, f"{key}.wv"),
        "dense": _lin(sd, f"{key}.dense"),
    }


def _encoder_layer(sd, key):
    return {
        "text_dense": _lin(sd, f"{key}.text_dense"),
        "ffn": _ffn(sd, f"{key}.ffn"),
        "mha": _mha(sd, f"{key}.mha"),
        "mha2": _mha(sd, f"{key}.mha2"),
        **{f"affine{i}": _affine(sd, f"{key}.affine{i}") for i in range(4)},
    }


def _conv_block(sd, key):
    return {
        "conv_skip": _conv(sd, f"{key}.conv_skip"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "conv2": _conv(sd, f"{key}.conv2"),
        "fc": _lin(sd, f"{key}.fc"),
        **{f"affine{i}": _affine(sd, f"{key}.affine{i}") for i in (1, 2, 3)},
    }


def _text_style(sd, key):
    return {
        "emb": {"embedding": np.asarray(sd[f"{key}.emb.weight"])},
        "style_ffn": _ffn(sd, f"{key}.style_ffn"),
        "text_ffn": _ffn(sd, f"{key}.text_ffn"),
        "mha": _mha(sd, f"{key}.mha"),
        **{f"affine{i}": _affine(sd, f"{key}.affine{i}") for i in (1, 2, 3, 4)},
    }


def convert_state_dict(sd: dict) -> dict:
    """Reference DiffusionModel state_dict -> dhg params tree (plain dicts)."""
    # Strip DDP 'module.' prefixes like the reference loader (checkpoint.py:98).
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}

    n_att = len({m.group(1) for k in sd if (m := re.match(r"att_layers\.(\d+)\.", k))})

    params = {
        "input_dense": _lin(sd, "input_dense"),
        "sigma_ffn": _ffn(sd, "sigma_ffn"),
        "text_style_model": _text_style(sd, "text_style_model"),
        "att_dense": _lin(sd, "att_dense"),
        "output_dense": _lin(sd, "output_dense"),
        "pen_lifts_dense": _lin(sd, "pen_lifts_dense.0"),
        "skip_conv1": _conv(sd, "skip_conv1"),
        "skip_conv2": _conv(sd, "skip_conv2"),
        "skip_conv3": _conv(sd, "skip_conv3"),
        "enc1": _conv_block(sd, "enc1"),
        "enc2": _conv_block(sd, "enc2"),
        "enc4": _conv_block(sd, "enc4"),
        "enc3": _encoder_layer(sd, "enc3"),
        "enc5": _encoder_layer(sd, "enc5"),
        "dec1": _conv_block(sd, "dec1"),
        "dec2": _conv_block(sd, "dec2"),
        "dec3": _conv_block(sd, "dec3"),
    }
    for i in range(n_att):
        params[f"att_layers_{i}"] = _encoder_layer(sd, f"att_layers.{i}")
    return params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--dst", required=True, help="output orbax checkpoint dir")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.src, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}

    params = convert_state_dict(sd)

    from dhg.checkpoint import save_checkpoint

    save_checkpoint(Path(args.dst), params)
    n = sum(int(np.prod(np.shape(v))) for v in _leaves(params))
    print(f"wrote {args.dst}: {n} params")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()

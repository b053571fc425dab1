"""Export dhg params as a reference-compatible PyTorch checkpoint (.pth).

The exact inverse of dhg/tools/convert_torch_checkpoint.py: a dhg params
tree (flax naming) becomes a state_dict using the reference
DiffusionModel's own parameter names (model.py:61-119), wrapped in the
reference's checkpoint container `{"meta": ..., "state_dict": ...}`
(checkpoint.py:225-253) so the reference's `load_checkpoint`/`load_model`
(checkpoint.py:92-130, 256-297) accept it unchanged. Together the pair
gives a full round trip: torch -> dhg (convert) and dhg -> torch (export),
so a model trained on TPU with dhg can be served by the original PyTorch
code, and vice versa.

Layout mapping (inverse of the converter's):
  * Dense kernel [in, out]   -> Linear weight [out, in] (transpose)
  * Conv kernel [kw, in, out] -> Conv1d weight [out, in, kw]
  * Embedding: identical layout
  * ffn {fc1, fc2} -> ff_network Sequential .1/.3 (utils/nn.py:165-175)
  * pen_lifts_dense -> pen_lifts_dense.0 (Sequential[Linear, Sigmoid])
  * att_layers_{i} -> att_layers.{i}

Usage:
    python -m dhg.tools.export_torch_checkpoint \
        --experiment_path runs/my_run/17.08/12.00.00 --dst model_final.pth
    # or point at a checkpoint directory directly:
    python -m dhg.tools.export_torch_checkpoint --src <orbax dir> --dst out.pth
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _lin(out: dict, key: str, tree: dict) -> None:
    """dhg Dense {'kernel','bias'} -> torch Linear weight/bias at `key`."""
    out[f"{key}.weight"] = np.ascontiguousarray(np.asarray(tree["kernel"], np.float32).T)
    if "bias" in tree:
        out[f"{key}.bias"] = np.asarray(tree["bias"], np.float32)


def _conv(out: dict, key: str, tree: dict) -> None:
    """dhg Conv kernel [kw, in, out] -> torch Conv1d [out, in, kw]."""
    w = np.asarray(tree["kernel"], np.float32).transpose(2, 1, 0)
    out[f"{key}.weight"] = np.ascontiguousarray(w)
    if "bias" in tree:
        out[f"{key}.bias"] = np.asarray(tree["bias"], np.float32)


def _ffn(out: dict, key: str, tree: dict, act_before: bool = True) -> None:
    i1, i2 = (1, 3) if act_before else (0, 2)
    _lin(out, f"{key}.{i1}", tree["fc1"])
    _lin(out, f"{key}.{i2}", tree["fc2"])


def _affine(out: dict, key: str, tree: dict) -> None:
    _lin(out, f"{key}.gamma_emb", tree["gamma_emb"])
    _lin(out, f"{key}.beta_emb", tree["beta_emb"])


def _mha(out: dict, key: str, tree: dict) -> None:
    for name in ("wq", "wk", "wv", "dense"):
        _lin(out, f"{key}.{name}", tree[name])


def _encoder_layer(out: dict, key: str, tree: dict) -> None:
    _lin(out, f"{key}.text_dense", tree["text_dense"])
    _ffn(out, f"{key}.ffn", tree["ffn"])
    _mha(out, f"{key}.mha", tree["mha"])
    _mha(out, f"{key}.mha2", tree["mha2"])
    for i in range(4):
        _affine(out, f"{key}.affine{i}", tree[f"affine{i}"])


def _conv_block(out: dict, key: str, tree: dict) -> None:
    _conv(out, f"{key}.conv_skip", tree["conv_skip"])
    _conv(out, f"{key}.conv1", tree["conv1"])
    _conv(out, f"{key}.conv2", tree["conv2"])
    _lin(out, f"{key}.fc", tree["fc"])
    for i in (1, 2, 3):
        _affine(out, f"{key}.affine{i}", tree[f"affine{i}"])


def _text_style(out: dict, key: str, tree: dict) -> None:
    out[f"{key}.emb.weight"] = np.asarray(tree["emb"]["embedding"], np.float32)
    _ffn(out, f"{key}.style_ffn", tree["style_ffn"])
    _ffn(out, f"{key}.text_ffn", tree["text_ffn"])
    _mha(out, f"{key}.mha", tree["mha"])
    for i in (1, 2, 3, 4):
        _affine(out, f"{key}.affine{i}", tree[f"affine{i}"])


def export_state_dict(params: dict) -> dict:
    """dhg params tree -> reference DiffusionModel state_dict (numpy values).

    Inverse of convert_torch_checkpoint.convert_state_dict; key names follow
    the reference module tree (model.py:61-119). Values are float32 numpy
    arrays — the CLI wraps them in torch tensors.
    """
    out: dict = {}
    _lin(out, "input_dense", params["input_dense"])
    _ffn(out, "sigma_ffn", params["sigma_ffn"])
    _text_style(out, "text_style_model", params["text_style_model"])
    _lin(out, "att_dense", params["att_dense"])
    _lin(out, "output_dense", params["output_dense"])
    _lin(out, "pen_lifts_dense.0", params["pen_lifts_dense"])
    for i in (1, 2, 3):
        _conv(out, f"skip_conv{i}", params[f"skip_conv{i}"])
    for name in ("enc1", "enc2", "enc4", "dec1", "dec2", "dec3"):
        _conv_block(out, name, params[name])
    for name in ("enc3", "enc5"):
        _encoder_layer(out, name, params[name])
    n_att = sum(1 for k in params if k.startswith("att_layers_"))
    for i in range(n_att):
        _encoder_layer(out, f"att_layers.{i}", params[f"att_layers_{i}"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--src", help="dhg orbax checkpoint directory")
    src.add_argument(
        "--experiment_path",
        help="dhg run dir; newest checkpoint discovered in reference order "
        "(model_final -> model_last -> highest checkpoint_<N>)",
    )
    ap.add_argument("--dst", required=True, help="output .pth path")
    ap.add_argument(
        "--use_ema",
        default=True,
        type=lambda s: s.lower() not in ("0", "false", "no"),
        help="prefer the EMA shadow when the checkpoint carries one (default true)",
    )
    args = ap.parse_args()

    from collections import OrderedDict

    import torch

    from dhg.checkpoint import load_checkpoint, resolve_checkpoint

    if args.src:
        ckpt_path = Path(args.src)
    else:
        found = resolve_checkpoint(args.experiment_path)
        if found is None:
            raise SystemExit(f"no checkpoint found under {args.experiment_path}")
        ckpt_path = found

    restored = load_checkpoint(ckpt_path)
    params = restored["params"]
    used_ema = False
    if args.use_ema and "ema_params" in restored:
        params = restored["ema_params"]
        used_ema = True

    sd = export_state_dict(params)
    state_dict = OrderedDict((k, torch.from_numpy(np.ascontiguousarray(v))) for k, v in sd.items())
    meta = {
        "exported_by": "dhg.tools.export_torch_checkpoint",
        "source_checkpoint": str(ckpt_path),
        "ema": used_ema,
    }
    if "step" in restored:
        meta["step"] = int(np.asarray(restored["step"]))
    # Reference container shape (checkpoint.py:244): meta + state_dict; the
    # reference loader reads ckpt["state_dict"] (checkpoint.py:118-124).
    torch.save({"meta": meta, "state_dict": state_dict}, args.dst)
    n = sum(int(v.numel()) for v in state_dict.values())
    print(f"wrote {args.dst}: {len(state_dict)} tensors, {n} params (ema={used_ema})")


if __name__ == "__main__":
    main()

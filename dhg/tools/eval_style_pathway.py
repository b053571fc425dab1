"""Style-pathway liveness probes for a trained run (round-4 verdict #2).

Two probes, both against a run dir (the second needs its validation split):

  1. OUTPUT-SWAP: sample the same prompt/key with style vectors from two
     different writers and with zero style; report pairwise stroke MSE.
     A dead pathway gives ~0 (round 3 measured exactly 0.0 on the
     synthetic-cache model); a live one responds to the swap.
  2. CONDITIONAL VAL LOSS: evaluate the model's val loss with (a) each
     row's TRUE style, (b) zero style, (c) styles shuffled across rows.
     A model that extracts information from style shows
     true < zero and true < shuffled; shuffled > zero additionally shows
     the WRONG style actively misleads (genuine conditioning, not a bias
     term).

Run:  python -m dhg.tools.eval_style_pathway --experiment_path=<run dir>
          [--tree=/tmp/iam_scale] [--checkpoint=<path>]
`tree` supplies the two probe style images (any IAM-shaped tree; defaults
to the run config's experiment.data_dir). Prints one JSON dict. Results
in PERFORMANCE.md ("Style pathway end-to-end", round 4).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

import numpy as np


def run(experiment_path: str, tree: str | None = None, checkpoint: str | None = None) -> dict:
    import warnings

    warnings.filterwarnings("ignore")
    import jax
    import jax.numpy as jnp

    from dhg.config import DLConfig
    from dhg.data.tokenizer import Tokenizer
    from dhg.eval import make_eval_fn
    from dhg.inference import generate, load_model, resolve_checkpoint, style_from_image
    from dhg.train import load_cache

    exp = Path(experiment_path)
    ckpt = checkpoint if checkpoint else str(resolve_checkpoint(exp))
    model, params = load_model(str(exp / "config.yml"), ckpt)
    cfg = DLConfig.load(str(exp / "config.yml"))
    weights = cfg.dataset_args.style_weights
    tree = tree or cfg.experiment.data_dir

    result: dict = {"checkpoint": ckpt}

    # Probe 1: output response to style swap (same key).
    tifs = sorted(glob.glob(str(Path(tree) / "lineImages" / "*" / "*" / "*.tif")))
    if len(tifs) >= 2:
        img_a, img_b = tifs[0], tifs[len(tifs) // 2]
        sa = jnp.asarray(style_from_image(img_a, style_weights=weights))
        sb = jnp.asarray(style_from_image(img_b, style_weights=weights))
        s0 = jnp.zeros_like(sa)
        tok = Tokenizer()
        text = jnp.asarray(tok.encode_batch(["style ablation probe"], 50), jnp.int32)
        key = jax.random.PRNGKey(42)
        outs = {
            n: np.asarray(generate(model, params, text, s, key, seq_len=200))
            for n, s in [("A", sa), ("B", sb), ("zero", s0)]
        }
        mse = lambda a, b: float(((a - b) ** 2).mean())
        result["output_swap"] = {
            "mse_A_vs_B": mse(outs["A"], outs["B"]),
            "mse_A_vs_zero": mse(outs["A"], outs["zero"]),
            "output_mean_sq": float((outs["A"] ** 2).mean()),
            "style_cos_A_B": float(
                (sa.ravel() @ sb.ravel()) / (jnp.linalg.norm(sa) * jnp.linalg.norm(sb))
            ),
        }

    # Probe 2: conditional val loss under true / zero / shuffled style.
    cache = load_cache(cfg, "validation")
    if cache is not None and len(cache) >= 8:
        n = min(256, len(cache))
        strokes = jnp.asarray(cache.strokes[:n])
        txt = jnp.asarray(cache.text[:n])
        style_true = jnp.asarray(cache.style[:n])
        perm = np.random.RandomState(0).permutation(n)
        eval_step = make_eval_fn(model)
        k = jax.random.PRNGKey(7)
        losses = {}
        for name, sty in [
            ("true", style_true),
            ("zero", jnp.zeros_like(style_true)),
            ("shuffled", style_true[perm]),
        ]:
            v = np.asarray(eval_step(params, strokes, txt, sty, k))
            losses[name] = [round(float(x), 5) for x in v]  # total, score, pen
        losses["style_informative"] = bool(
            losses["true"][0] < losses["zero"][0]
            and losses["true"][0] < losses["shuffled"][0]
        )
        result["val_loss_by_style"] = losses
    print(json.dumps(result))
    return result


def main():
    kv = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "experiment_path" not in kv:
        raise SystemExit("usage: eval_style_pathway --experiment_path=<run dir> [--tree=...]")
    run(kv["experiment_path"], kv.get("tree"), kv.get("checkpoint"))


if __name__ == "__main__":
    main()

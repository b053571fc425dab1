"""Quality evaluation for the experimental encoder_reuse sampler mode.

    python -m dhg.tools.eval_encoder_reuse --experiment_path=<run dir> \
        [--batch=96] [--prompt_len=24] [--reuse=2,3,4]

encoder_reuse=k runs the U-Net encoder half only every k-th diffusion step
(Li et al., "Faster Diffusion", arXiv:2312.09608), decoding cached skip
features in between — measured +17% (k=2) / +21% (k=3) sampler throughput
in round 1 (PERFORMANCE.md). This tool measures what that approximation
COSTS on trained weights: it samples the same prompts with the same PRNG
key at k=1 (exact) and each requested k, and reports

  * stroke-delta MSE vs the exact trajectory (the BASELINE acceptance
    currency, 1e-3 bar),
  * pen-lift disagreement rate (rounded pen bits that flip),
  * max |delta| drift.

Same key => identical noise both runs; differences are purely the
approximation. Results feed the PERFORMANCE.md quality table that decides
whether the flag stays experimental-off or earns a recommended setting.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_reuse(
    model,
    params,
    batch: int = 96,
    prompt_len: int = 24,
    reuse_values=(2, 3, 4),
    seed: int = 0,
    diffusion_mode: str = "new",
):
    from dhg.core.sampling import infer_seq_len
    from dhg.inference import generate

    seq_len = infer_seq_len(prompt_len)
    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    # Zero-pad the tail so the padding-mask path is realistic.
    text = text.at[:, prompt_len:].set(0)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
    key = jax.random.PRNGKey(seed)

    exact = np.asarray(
        generate(model, params, text, style, key, seq_len=seq_len,
                 diffusion_mode=diffusion_mode)
    )

    rows = []
    for k in reuse_values:
        approx = np.asarray(
            generate(model, params, text, style, key, seq_len=seq_len,
                     diffusion_mode=diffusion_mode, encoder_reuse=int(k))
        )
        d_xy = approx[..., :2] - exact[..., :2]
        pen_flip = np.mean(np.round(approx[..., 2]) != np.round(exact[..., 2]))
        rows.append(
            {
                "reuse_every": int(k),
                "stroke_mse": float(np.mean(d_xy**2)),
                "stroke_max_abs": float(np.abs(d_xy).max()),
                "pen_flip_rate": float(pen_flip),
                "under_1e-3_bar": bool(np.mean(d_xy**2) <= 1e-3),
            }
        )
    return {"batch": batch, "seq_len": seq_len, "mode": diffusion_mode, "rows": rows}


def main(argv=None):
    from pathlib import Path

    from dhg.checkpoint import load_model, resolve_checkpoint
    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    exp = Path(kw["experiment_path"])
    ckpt = resolve_checkpoint(exp)
    model, params = load_model(exp / "config.yml", ckpt)
    reuse = [int(x) for x in str(kw.get("reuse", "2,3,4")).split(",")]
    report = evaluate_reuse(
        model,
        params,
        batch=int(kw.get("batch", 96)),
        prompt_len=int(kw.get("prompt_len", 24)),
        reuse_values=reuse,
        diffusion_mode=str(kw.get("diffusion_mode", "new")),
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

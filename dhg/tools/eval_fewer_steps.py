"""Fidelity + speed evaluation for strided fewer-step sampling.

    python -m dhg.tools.eval_fewer_steps --experiment_path=<run dir> \
        [--batch=96] [--prompt_len=24] [--steps=30,20,15,10]

generate(n_steps=k) walks a coarsened beta table whose cumprod(1 - beta)
hits k of the canonical 60 alpha_bar levels exactly (strided DDPM —
dhg.core.schedule.strided_beta_set), so a line costs k denoiser calls
instead of 60. This tool measures what the coarsening costs on trained
weights and what it buys on the clock:

  * stroke-delta MSE / max drift / pen-flip rate vs the 60-step sampler
    under the same PRNG key. For the stochastic modes ("new"/"standard")
    the strided trajectory draws a DIFFERENT number of noise samples, so
    outputs are not noise-matched step-for-step — there the comparison is
    distribution-level closeness of the endpoint. For --diffusion_mode=
    ddim the update ignores per-step noise entirely and both trajectories
    start from the SAME x0, so the MSE is a true discretization-error
    measure — use ddim for an apples-to-apples fidelity read;
  * chained-dispatch ms/call and lines/s at each k (bench_hoist
    methodology: N calls queued, one D2H fence).

Results feed PERFORMANCE.md "Fewer-step sampling". The 60-step path stays
the default/parity path; n_steps is an opt-in speed knob.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def evaluate_fewer_steps(
    model,
    params,
    batch: int = 96,
    prompt_len: int = 24,
    steps_values=(30, 20, 15, 10),
    seed: int = 0,
    diffusion_mode: str = "new",
    iters: int = 4,
):
    from dhg.core.sampling import infer_seq_len
    from dhg.inference import generate

    seq_len = infer_seq_len(prompt_len)
    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    text = text.at[:, prompt_len:].set(0)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
    key = jax.random.PRNGKey(seed)

    def timed(n_steps):
        def call(k):
            return generate(
                model, params, text, style, k, seq_len=seq_len,
                diffusion_mode=diffusion_mode, n_steps=n_steps,
            )

        out = np.asarray(call(key))  # compile + result for fidelity
        t0 = time.perf_counter()
        last = None
        for i in range(iters):
            last = call(jax.random.fold_in(key, i))
        np.asarray(last)
        return out, (time.perf_counter() - t0) / iters

    exact, sec60 = timed(None)
    rows = []
    for k in steps_values:
        approx, sec = timed(int(k))
        d_xy = approx[..., :2] - exact[..., :2]
        rows.append(
            {
                "n_steps": int(k),
                "stroke_mse": float(np.mean(d_xy**2)),
                "stroke_max_abs": float(np.abs(d_xy).max()),
                "pen_flip_rate": float(
                    np.mean(np.round(approx[..., 2]) != np.round(exact[..., 2]))
                ),
                "ms_per_call": round(sec * 1000, 1),
                "lines_per_sec": round(batch / sec, 1),
                "speedup_vs_60": round(sec60 / sec, 2),
            }
        )
    return {
        "batch": batch,
        "seq_len": seq_len,
        "mode": diffusion_mode,
        "ms_per_call_60": round(sec60 * 1000, 1),
        "rows": rows,
    }


def main(argv=None):
    from pathlib import Path

    from dhg.checkpoint import load_model, resolve_checkpoint
    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    exp = Path(kw["experiment_path"])
    ckpt = resolve_checkpoint(exp)
    model, params = load_model(exp / "config.yml", ckpt)
    steps = [int(x) for x in str(kw.get("steps", "30,20,15,10")).split(",")]
    report = evaluate_fewer_steps(
        model,
        params,
        batch=int(kw.get("batch", 96)),
        prompt_len=int(kw.get("prompt_len", 24)),
        steps_values=steps,
        diffusion_mode=str(kw.get("diffusion_mode", "new")),
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

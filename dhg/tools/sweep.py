"""Batched sampling sweep (BASELINE config 5): batch x diffusion-steps grid.

    python -m dhg.tools.sweep [--batches=16,96,256] [--steps=20,30,60]
                              [--prompt_len=24]

Prints one JSON line per cell: batch, n_steps, wall time, denoise steps/s,
amortized ms/line. Uses random weights (throughput is weight-independent);
pass --experiment_path to sweep a trained checkpoint instead.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dhg.config import parse_cli_kwargs
from dhg.core.sampling import infer_seq_len
from dhg.core.schedule import get_beta_set


def main(argv=None) -> None:
    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    batches = [int(b) for b in str(kw.get("batches", "16,96,256")).split(",")]
    steps_list = [int(s) for s in str(kw.get("steps", "20,30,60")).split(",")]
    guidance_list = [float(g) for g in str(kw.get("guidance", "1.0")).split(",")]
    prompt_len = int(kw.get("prompt_len", 24))
    seq_len = infer_seq_len(prompt_len)

    from dhg.inference import _sample_jit
    from dhg.models.denoiser import DiffusionModel

    if kw.get("experiment_path"):
        from dhg.checkpoint import load_model, resolve_checkpoint

        exp = kw["experiment_path"]
        model, params = load_model(f"{exp}/config.yml", resolve_checkpoint(exp))
    else:
        model = DiffusionModel(num_layers=2, dtype=jnp.bfloat16)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, seq_len, 2)),
            jnp.zeros((1, 50), jnp.int32),
            jnp.ones((1, 1)),
            jnp.zeros((1, 14, 1280)),
        )["params"]

    for batch in batches:
        text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
        style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
        for n_steps in steps_list:
            for g in guidance_list:
                beta = get_beta_set(n_steps)
                gs = None if g == 1.0 else g

                def run(k):
                    return _sample_jit(
                        model, params, (text, style), batch, seq_len, k, beta, "new", gs
                    )

                np.asarray(run(jax.random.PRNGKey(3)))  # compile
                times = []
                for i in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run(jax.random.fold_in(jax.random.PRNGKey(4), i)))
                    times.append(time.perf_counter() - t0)
                t = min(times)
                print(
                    json.dumps(
                        {
                            "batch": batch,
                            "n_steps": n_steps,
                            "guidance": g,
                            "seq_len": seq_len,
                            "time_s": round(t, 4),
                            "denoise_steps_per_sec": round(n_steps * batch / t, 1),
                            "ms_per_line": round(1000 * t / batch, 3),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()

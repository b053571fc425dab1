"""Measure the sampler's batch/hoist grid (round-2 verdict #2: batch-512 HBM).

Full hoist precomputes all 60 steps' cross-attention K/V (fastest, but the
context scales with batch and OOMs a 16 GB v5e at batch 512 — round-2
measurement); compact hoist keeps only cond_all and rebuilds K/V in-scan
(dhg/inference.py::_sample_jit docstring). This sweeps both over batch and
reports chained-dispatch device time (N calls queued, one D2H fence — the
methodology PERFORMANCE.md uses for optimization decisions).

Run on the TPU:  python -m dhg.tools.bench_hoist [--batches=256,512,768]
Results recorded in PERFORMANCE.md "Round-3: batch-512 ceiling".
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

N_STEPS = 60
SEQ_LEN = 392  # 24-token prompt bucket, same as bench.py


def measure(batch: int, hoist: str, iters: int = 4) -> dict:
    # Methodology mirrors bench.py (same model plan/init keys, chained
    # dispatch with one D2H fence — bench.py::timed_sustained); kept
    # inline rather than imported so this tool can vary `hoist` and batch
    # without touching the driver-contract file. If bench.py's timing
    # methodology changes, change this to match.
    from dhg.inference import _sample_jit
    from dhg.models.denoiser import DiffusionModel
    import jax.numpy as jnp

    model = DiffusionModel(num_layers=2, dtype=jnp.bfloat16)
    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, SEQ_LEN, 2)),
        text[:1],
        jnp.ones((1, 1)),
        style[:1],
    )["params"]

    def sample(k):
        return _sample_jit(
            model, params, (text, style), batch, SEQ_LEN, k, None, "new",
            None, None, None, hoist,
        )

    key = jax.random.PRNGKey(7)
    try:
        np.asarray(sample(key))  # compile + absorb layout
    except Exception as e:  # noqa: BLE001 — OOM reporting is the point
        return {"batch": batch, "hoist": hoist, "error": type(e).__name__,
                "detail": str(e).split("\n")[0][:200]}
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = sample(jax.random.fold_in(key, i))
    np.asarray(out)
    sec = (time.perf_counter() - t0) / iters
    return {
        "batch": batch,
        "hoist": hoist,
        "ms_per_call": round(sec * 1000, 1),
        "ms_per_step": round(sec * 1000 / N_STEPS, 3),
        "denoise_steps_per_sec": round(N_STEPS * batch / sec),
    }


def main():
    kv = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    batches = [int(b) for b in kv.get("batches", "256,512,768").split(",")]
    hoists = kv.get("hoist", "full,compact").split(",")
    grid = []
    for b in batches:
        for hoist in hoists:
            r = measure(b, hoist)
            print(r, flush=True)
            grid.append(r)
    best = max((g for g in grid if "error" not in g),
               key=lambda g: g["denoise_steps_per_sec"], default=None)
    print("BEST:", best, flush=True)


if __name__ == "__main__":
    main()

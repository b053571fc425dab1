"""Profile the TRAIN step the way the sampler was profiled (round-4 #3).

PERFORMANCE.md's claim that "one v5e chip is compute-saturated at batch 96"
was inferred from flat samples/s across batch sizes, never from a
FLOP/MFU accounting or a trace. This tool produces the accounting:

  1. XLA cost analysis of the jitted fused train step (FLOPs + HBM bytes
     per step) at the given batch;
  2. measured steps/s via the production 16-step chunked-scan path
     (Trainer.make_chunk_fn — same program bench.py times);
  3. derived MFU (vs the ~197 TFLOP/s v5e bf16 peak the round-2 sampler
     roofline used) and HBM-bandwidth utilization (vs ~819 GB/s);
  4. a fwd/bwd split: the same chunk program with loss-only bodies
     (no grad, no update) vs the full step, so the backward+optimizer
     share of the wall is measured, not guessed;
  5. optionally (--trace_dir=...) a jax.profiler trace of a few steps for
     per-op inspection in Perfetto/XProf.

Run:  python -m dhg.tools.profile_train [--batch=96] [--trace_dir=/tmp/tr]
Prints one JSON dict; results recorded in PERFORMANCE.md ("Train-step
profile", round 4).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # same peak the sampler roofline used
V5E_HBM_BYTES_PER_S = 819e9


def _cost(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", float("nan"))),
            "bytes": float(ca.get("bytes accessed", float("nan"))),
        }
    except Exception as e:  # backends without cost analysis
        return {"flops": float("nan"), "bytes": float("nan"), "error": str(e)}


def profile(batch: int = 96, steps_per_window: int = 96, trace_dir: str | None = None):
    import jax
    import jax.numpy as jnp

    from dhg.config import DLConfig, fit_config
    from dhg.train import Trainer

    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{"training_args.batch_size": batch, "training_args.max_files": 256},
        )
    )
    t = Trainer(cfg)
    data = t.load_dataset()
    state = t.init_state(0)
    chunk = t.make_chunk_fn(data)
    key = jax.random.PRNGKey(0)
    steps = -(-steps_per_window // 16) * 16

    # --- cost analysis of ONE step (the per-step program, not the chunk:
    # the chunk is 16 identical bodies + scan plumbing) ------------------
    step = jax.jit(t._build_step())
    lowered = step.lower(state, key, data.arrays)
    cost1 = _cost(lowered.compile())

    # --- measured steps/s through the production chunked path -----------
    def run(base: int, st):
        rows = None
        for lo in range(base, base + steps, 16):
            counts = jnp.arange(lo, lo + 16, dtype=jnp.int32)
            st, rows = chunk(st, key, counts)
        np.asarray(rows[-1])
        return st

    state = run(10_000, state)  # compile
    state = run(20_000, state)  # absorb donated-layout recompile
    rates = []
    for trial in range(3):
        t0 = time.perf_counter()
        state = run(trial * steps, state)
        rates.append(steps / (time.perf_counter() - t0))
    sps = float(np.median(rates))

    # --- forward-only share: same chunk structure, same per-body forward
    # (gather, alpha/noise draws, model.apply, diffusion_loss — exactly the
    # train step's loss_fn, dhg/train.py::_build_step) with no grad/update.
    from dhg.core.losses import diffusion_loss
    from dhg.core.schedule import sample_alphas
    from dhg.data.pipeline import gather_batch

    model, alpha_set = t.model, t.alpha_set

    @jax.jit
    def fwd_chunk(params, root_key, arrays):
        def body(carry, c):
            ks = jax.random.split(jax.random.fold_in(root_key, c), 5)
            k_batch, k_alpha, k_eps, k_drop = ks[:4]
            strokes3, text, style = gather_batch(arrays, k_batch, batch)
            x, pen = strokes3[..., :2], strokes3[..., 2]
            alphas = sample_alphas(k_alpha, batch, alpha_set)
            eps = jax.random.normal(k_eps, x.shape)
            xt = jnp.sqrt(alphas)[..., None] * x + jnp.sqrt(1.0 - alphas)[..., None] * eps
            eps_pred, pen_pred = model.apply(
                {"params": params},
                xt,
                text,
                jnp.sqrt(alphas),
                style,
                deterministic=False,
                rngs={"dropout": k_drop},
            )
            total, _, _ = diffusion_loss(eps, eps_pred, pen, pen_pred, alphas)
            return carry, total

        return jax.lax.scan(body, 0.0, jnp.arange(steps, dtype=jnp.int32))

    np.asarray(fwd_chunk(state.params, key, data.arrays)[1][-1])  # compile+warm
    fwd_rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fwd_chunk(state.params, key, data.arrays)[1][-1])
        fwd_rates.append(steps / (time.perf_counter() - t0))
    fwd_sps = float(np.median(fwd_rates))

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        state = run(50_000, state)
        jax.profiler.stop_trace()

    ms_per_step = 1000.0 / sps
    result = {
        "batch": batch,
        "backend": jax.default_backend(),
        "steps_per_sec": round(sps, 2),
        "rate_trials": [round(r, 2) for r in rates],
        "ms_per_step": round(ms_per_step, 3),
        "samples_per_sec": round(sps * batch, 0),
        "flops_per_step": cost1["flops"],
        "hbm_bytes_per_step": cost1["bytes"],
        "achieved_tflops": round(cost1["flops"] * sps / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(cost1["flops"] * sps / V5E_BF16_PEAK_FLOPS, 4),
        "hbm_bw_gbps": round(cost1["bytes"] * sps / 1e9, 1),
        "hbm_bw_util": round(cost1["bytes"] * sps / V5E_HBM_BYTES_PER_S, 4),
        "fwd_only_steps_per_sec": round(fwd_sps, 2),
        "fwd_only_ms": round(1000.0 / fwd_sps, 3),
        "bwd_plus_update_ms": round(ms_per_step - 1000.0 / fwd_sps, 3),
        "trace_dir": trace_dir,
    }
    print(json.dumps(result))
    return result


def main():
    kv = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    profile(
        batch=int(kv.get("batch", 96)),
        steps_per_window=int(kv.get("steps_per_window", 96)),
        trace_dir=kv.get("trace_dir"),
    )


if __name__ == "__main__":
    main()

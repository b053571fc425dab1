"""Measure parallel-in-time (Jacobi) DDIM sampling vs the sequential scan.

    python -m dhg.tools.eval_parallel_sampler [--experiment_path=<run dir>]
        [--batch=1] [--tokens=24] [--sweeps=4,8,12,16] [--iters=20]

For each sweep count k: wall time per call (chained dispatch, one D2H
fence — the repo's standard device-time methodology, DEVNOTES.md) and
stroke-MSE of the k-sweep estimate vs the SEQUENTIAL 60-step DDIM
trajectory from the same key (the fixed point). The sequential baseline
is the production compact-hoist program (dhg.inference.generate,
diffusion_mode="ddim"). Convergence MSEs for every k come from ONE
return_all_sweeps run at max(sweeps), so adding sweep values to the
timing grid is the only extra compile cost.

Rationale + result tables: PERFORMANCE.md "Parallel-in-time sampling";
the sampler itself is dhg/core/parallel_sampling.py.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _timed_sustained(fn, key, iters: int) -> float:
    out = fn(key)
    np.asarray(out)  # compile + absorb layout recompiles
    out = fn(jax.random.fold_in(key, 999))
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(key, i))
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None) -> None:
    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    batch = int(kw.get("batch", 1))
    tokens = int(kw.get("tokens", 24))
    iters = int(kw.get("iters", 20))
    sweep_list = [int(s) for s in str(kw.get("sweeps", "4,8,12,16")).split(",") if s.strip()]

    from dhg.core.parallel_sampling import parallel_ddim_sample
    from dhg.core.sampling import infer_seq_len
    from dhg.inference import generate
    from dhg.models.denoiser import DiffusionModel

    seq_len = infer_seq_len(tokens)
    rng = np.random.RandomState(0)
    text = np.zeros((batch, 50), np.int32)
    text[:, :tokens] = rng.randint(2, 73, size=(batch, tokens))
    text[:, tokens] = 1
    text = jnp.asarray(text)
    style = jnp.zeros((batch, 14, 1280))

    if kw.get("experiment_path"):
        from dhg.checkpoint import load_model, resolve_checkpoint

        exp = kw["experiment_path"]
        model, params = load_model(f"{exp}/config.yml", resolve_checkpoint(exp))
    else:
        model = DiffusionModel(num_layers=2, dtype=jnp.bfloat16)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, seq_len, 2)),
            text[:1],
            jnp.ones((1, 1)),
            style[:1],
        )["params"]

    key = jax.random.PRNGKey(42)

    # -- sequential baseline: the production DDIM program -------------------
    def seq_fn(k):
        return generate(
            model, params, text, style, k, seq_len=seq_len, diffusion_mode="ddim"
        )

    t_seq = _timed_sustained(seq_fn, key, iters)
    seq_out = np.asarray(seq_fn(key))
    print(f"sequential ddim  batch={batch} T={seq_len}: {t_seq * 1e3:8.1f} ms/call")

    # -- parallel: conditioning tiled to n*B ---------------------------------
    def denoise_any(x, sigma):
        reps = x.shape[0] // batch
        return model.apply(
            {"params": params},
            x,
            jnp.tile(text, (reps, 1)),
            sigma,
            jnp.tile(style, (reps, 1, 1)),
        )

    # Convergence from ONE run at the largest sweep count.
    k_max = max(sweep_list)
    _, ests = jax.jit(
        lambda k: parallel_ddim_sample(
            denoise_any, k, batch_size=batch, seq_len=seq_len,
            sweeps=k_max, return_all_sweeps=True,
        )
    )(key)
    ests = np.asarray(ests)
    mses = ((ests[..., :2] - seq_out[None, ..., :2]) ** 2).mean(axis=(1, 2, 3))

    print(f"{'sweeps':>6} {'ms/call':>9} {'vs seq':>7} {'stroke MSE':>11}")
    for k in sweep_list:
        fn = jax.jit(
            lambda kk, k=k: parallel_ddim_sample(
                denoise_any, kk, batch_size=batch, seq_len=seq_len, sweeps=k
            )
        )
        t_par = _timed_sustained(fn, key, iters)
        print(
            f"{k:>6} {t_par * 1e3:>9.1f} {t_seq / t_par:>6.2f}x {mses[k - 1]:>11.3e}"
        )


if __name__ == "__main__":
    main()

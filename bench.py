"""Benchmark harness — the BASELINE.json north-star metric.

Measures on the current default JAX backend (one TPU chip under the driver):
  1. denoise steps/sec/chip: batched 60-step sampler (batch 256, T = 392,
     the 24-char-prompt bucket — the BASELINE config-5 sweep batch) — each
     "denoise step" is one denoiser forward for one line;
  2. p50 latency per generated line: single-line (batch 1) 60-step sampler;
  3. training steps/s at the reference's best-run batch size (96).

Prints ONE JSON line {metric, value, unit, vs_baseline, ...extras}.

Measurement hardening (round 3 — the round-2 driver numbers regressed on a
noisy tunnel with single-window timing):
  * every metric is the MEDIAN over >= 3 independent trials;
  * the axon-tunnel round-trip (the ~dozens-of-ms cost any per-call D2H
    fence pays, regardless of device work) is measured directly with a
    trivial program and reported as tunnel_rtt_ms, so p50 decomposes into
    device time + transport;
  * p50 pools 3 x 10 fenced calls instead of one 10-call window.

vs_baseline: the reference publishes no sampler numbers (BASELINE.md). Its
only quantitative record is training at ~10.4 steps/s @ batch 96 on one
A100 (~1,000 samples/s, run.log) — one training step costs ~3 denoiser-
equivalent passes (fwd+bwd), i.e. the A100 sustains ~3,000 denoiser-fwd-
equivalents/s. We use that as the cross-accelerator baseline for
denoise steps/sec/chip.

vs_cpu_x (round 4): the BASELINE ">= 20x vs CPU" target is now checked
against a MEASURED denominator, not an estimate: bench.py re-times the
reference's own 60-step CPU loop in-run (dhg/tools/bench_reference_cpu.py
imports /root/reference's real model + step rules; charitable no-grad
variant) and divides by the per-call-fenced p50. If the reference import
fails, the 2026-08-20 measurement on this host is used instead and
cpu_baseline_source says "recorded". Caveat disclosed in the JSON: this
host exposes ONE CPU core (torch single-threaded), so the CPU denominator
is a 1-thread number.

train_compute_dtype (round 4): dhg trains bf16-compute/f32-params (the
TPU-native choice); the reference A100 number is fp32/TF32. The field
makes the dtype asymmetry visible to the driver.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.sampling import diffusion_sample, infer_seq_len
from dhg.inference import make_denoise_fn
from dhg.models.denoiser import DiffusionModel

A100_DENOISE_FWD_EQUIV_PER_SEC = 3000.0  # derived from run.log training rate

# Reference CPU baseline measured 2026-08-20 on THIS host (1 CPU core,
# torch 2.13.0+cpu single-threaded) via dhg/tools/bench_reference_cpu.py:
# 60-step loop at T=392 batch 1 = 2.442 s/line charitable torch.no_grad
# (3.584 s as shipped — infer() records the autograd graph); train step
# batch 96 = 0.093 steps/s. Used only if the in-run re-measurement fails.
REFERENCE_CPU_MEASURED = {"line_s": 2.442, "train_steps_per_sec": 0.093}

# Train-step FLOPs from XLA cost analysis at batch 96, measured 2026-08-20
# (dhg/tools/profile_train; scales linearly with batch — verified at 192
# and 384). v5e bf16 peak as in PERFORMANCE.md's rooflines.
TRAIN_FLOPS_PER_STEP_B96 = 603.45e9
V5E_BF16_PEAK_FLOPS = 197e12

PROMPT_LEN = 24  # tokens (e.g. "Follow the White Rabbit" + EOS)
N_STEPS = 60
TRIALS = 3


def measure_cpu_baseline() -> dict:
    """Re-measure the reference's CPU line cost in-run (~20 s); fall back
    to the recorded 2026-08-20 measurement if the import breaks."""
    import os

    if os.environ.get("DHG_BENCH_CPU", "1") != "1":
        return {**REFERENCE_CPU_MEASURED, "source": "recorded (skipped by env)"}
    try:
        from dhg.tools.bench_reference_cpu import bench_sampler

        s = bench_sampler(iters=2)
        # Conservative denominator: a loaded host slows the torch-CPU loop
        # more than the (device-bound) TPU path, which would FLATTER
        # vs_cpu_x — so take the faster of the in-run measurement and the
        # recorded unloaded-host measurement.
        measured = s["line_s_no_grad_median"]
        line_s = min(measured, REFERENCE_CPU_MEASURED["line_s"])
        return {
            "line_s": line_s,
            "line_s_in_run": measured,
            "train_steps_per_sec": REFERENCE_CPU_MEASURED["train_steps_per_sec"],
            "source": "measured (min of in-run no_grad and recorded unloaded run)",
        }
    except Exception as e:  # torch/reference absent on some hosts
        return {**REFERENCE_CPU_MEASURED, "source": f"recorded ({type(e).__name__})"}


def build(batch: int, seq_len: int, dtype=jnp.bfloat16, hoisted: bool = True):
    model = DiffusionModel(num_layers=2, dtype=dtype)
    key = jax.random.PRNGKey(0)
    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))
    params = model.init(
        key,
        jnp.zeros((1, seq_len, 2)),
        text[:1],
        jnp.ones((1, 1)),
        style[:1],
    )["params"]

    if hoisted:
        from dhg.inference import _sample_jit

        def sample(k):
            return _sample_jit(model, params, (text, style), batch, seq_len, k, None, "new")

        return sample

    denoise = make_denoise_fn(model, params, text, style)

    @jax.jit
    def sample(k):
        return diffusion_sample(denoise, k, batch, seq_len)

    return sample


def measure_tunnel_rtt(iters: int = 20) -> float:
    """Median wall time of a trivial fenced program call — on the axon
    tunnel this is dominated by transport RTT (~35 ms measured round 2),
    on a local backend it is ~sub-ms dispatch. Reported so the p50 line
    latency decomposes into device time + transport."""

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(x))  # compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def timed(fn, key, iters: int, salt: int = 0):
    # Sync via host transfer of the (small) output: under the axon remote
    # runtime block_until_ready can return before execution completes, so a
    # D2H fetch is the only trustworthy fence. The transferred result is
    # [B, T, 3] floats (~100 KB) — negligible vs the 60-step sampler.
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(key, salt + i))
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def timed_sustained(fn, key, iters: int, salt: int = 0) -> float:
    """Sustained throughput: queue `iters` calls, fence once at the end.

    The per-call D2H fence in timed() includes the tunnel RTT per call
    (measured and reported separately, see measure_tunnel_rtt) — a harness
    artifact, not device time. A serving/sweep pipeline dispatches
    continuously, so throughput is measured with chained dispatch; latency
    (p50) keeps the per-call fence since a single request really does pay
    the round trip. Returns seconds per call.
    """
    out = fn(jax.random.fold_in(key, salt))
    np.asarray(out)  # absorb any layout recompile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jax.random.fold_in(key, salt + i))
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def bench_training(batch: int = 96, steps: int = 32, trials: int = TRIALS) -> dict:
    """Fused train-step throughput (steps/s) at the reference's best-run
    batch size on synthetic data — comparable to run.log's ~10.4 steps/s
    on one A100. Median over `trials` windows of `steps` steps."""
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
    # The production loop scans up to 16 steps per device program
    # (Trainer.make_chunk_fn — the per-step host loop was dispatch-bound at
    # ~50 steps/s with ±40% tunnel noise); measure that same path.
    chunk = t.make_chunk_fn(data)
    key = jax.random.PRNGKey(0)

    # Whole 16-step chunks only: `steps` rounds UP to a multiple of 16 and
    # the rate divides by the steps actually executed.
    steps = -(-steps // 16) * 16

    def run(base: int) -> None:
        # 16-step chunks exactly like Trainer.train's auto mode, one D2H
        # fence at the end of the window (see timed()).
        nonlocal state
        rows = None
        for lo in range(base, base + steps, 16):
            counts = jnp.arange(lo, lo + 16, dtype=jnp.int32)
            state, rows = chunk(state, key, counts)
        np.asarray(rows[-1])

    # Two warm-ups: the first compiles; the second absorbs the one-time
    # recompile when the returned (donated) state's layouts replace the
    # init-time ones.
    run(10_000)
    run(20_000)
    rates = []
    for trial in range(trials):
        t0 = time.perf_counter()
        run(trial * steps)
        rates.append(steps / (time.perf_counter() - t0))
    return {
        "median": float(np.median(rates)),
        "trials": [round(r, 2) for r in rates],
        "compute_dtype": str(cfg.training_args.compute_dtype or "float32"),
    }


def main():
    seq_len = infer_seq_len(PROMPT_LEN)  # 392
    key = jax.random.PRNGKey(123)

    rtt = measure_tunnel_rtt()

    # Throughput: batch-256 sampler (BASELINE config 5's sweep batch size),
    # sustained dispatch (see timed_sustained for the methodology note),
    # median of TRIALS independent 6-call windows.
    batch = 256
    sample_b = build(batch, seq_len)
    jax.block_until_ready(sample_b(key))  # compile
    sec_trials = [timed_sustained(sample_b, key, 6, salt=100 * t) for t in range(TRIALS)]
    sec_per_call = float(np.median(sec_trials))
    steps_per_sec = N_STEPS * batch / sec_per_call

    # Latency: single line, per-call fenced; pool TRIALS x 10 samples.
    sample_1 = build(1, seq_len)
    jax.block_until_ready(sample_1(key))  # compile
    times_1 = np.concatenate(
        [timed(sample_1, key, 10, salt=100 * t) for t in range(TRIALS)]
    )
    p50 = float(np.percentile(times_1, 50))

    import os

    train = None
    if os.environ.get("DHG_BENCH_TRAIN", "1") == "1":
        train = bench_training()

    cpu = measure_cpu_baseline()

    result = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(float(steps_per_sec), 2),
        "unit": "denoiser_fwd/s",
        "vs_baseline": round(float(steps_per_sec) / A100_DENOISE_FWD_EQUIV_PER_SEC, 3),
        "p50_line_latency_s": round(p50, 4),
        "p50_device_only_s": round(max(p50 - rtt, 0.0), 4),
        "tunnel_rtt_ms": round(rtt * 1000, 2),
        "batch": batch,
        "seq_len": seq_len,
        "n_diffusion_steps": N_STEPS,
        "trials": TRIALS,
        "throughput_trial_ms_per_call": [round(s * 1000, 1) for s in sec_trials],
        "throughput_timing": "sustained-dispatch median-of-trials (p50 is per-call fenced)",
        "train_steps_per_sec_batch96": round(train["median"], 2) if train else None,
        "train_trials": train["trials"] if train else None,
        "train_vs_a100_10.4": round(train["median"] / 10.4, 2) if train else None,
        "train_compute_dtype": train["compute_dtype"] if train else None,
        "train_mfu": round(
            train["median"] * TRAIN_FLOPS_PER_STEP_B96 / V5E_BF16_PEAK_FLOPS, 4
        ) if train else None,
        "train_dtype_note": "reference A100 number is fp32/TF32; dhg trains "
        "bf16-compute/f32-params (TPU-native choice)",
        "cpu_baseline_line_s": cpu["line_s"],
        "cpu_baseline_line_s_in_run": cpu.get("line_s_in_run"),
        "cpu_baseline_source": cpu["source"],
        "cpu_baseline_host_note": "1-CPU host, torch single-threaded",
        "vs_cpu_x": round(cpu["line_s"] / p50, 1),
        "train_vs_cpu_x": round(
            train["median"] / cpu["train_steps_per_sec"], 1
        ) if train else None,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

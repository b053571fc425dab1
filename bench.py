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

Round-5 hardening — the round-4 driver run NEVER PRINTED (rc=124: the
remote-compile wall time grew past the driver's timeout once the in-run
CPU baseline landed). Two structural fixes:
  * CONCURRENT COMPILES: the remote compile service overlaps concurrent
    requests almost perfectly (measured: 3 programs compiled in 0.7 s wall
    vs 4.1 s sequentially), and compilation does not occupy the chip — so
    the samplers, the train-step programs, and the torch-CPU baseline all
    compile/measure in worker threads while the main thread runs its
    phases. Device EXECUTIONS from workers are gated on a quiet flag so
    they never land inside a measurement window.
  * A WATCHDOG + SIGTERM handler: every completed trial lands in a shared
    result dict, and the one JSON line is emitted from whatever has been
    measured when (a) all phases finish, (b) the internal deadline
    (DHG_BENCH_DEADLINE_S, default 780 s — the sequential round-4 bench
    took 15m24s on this host and the driver's budget is ~15 min) expires,
    or (c) SIGTERM/SIGINT arrives. The WATCHDOG is the real guarantee:
    measured round 5, an external SIGTERM during a remote compile kills
    the process before the Python handler runs (the axon client's C layer
    terminates on it; the same handler works fine on the CPU backend), so
    the deadline must stay comfortably under the driver's timeout — the
    watchdog daemon thread fires regardless of what the main thread is
    blocked in (validated live: DHG_BENCH_DEADLINE_S=70 emitted a valid
    partial line mid-compile on the TPU). Unmeasured fields are null, bench_status says which phase was
    cut, and phase progress is logged to stderr with timestamps so a
    truncated tail is still diagnosable.

vs_baseline: the reference publishes no sampler numbers (BASELINE.md). Its
only quantitative record is training at ~10.4 steps/s @ batch 96 on one
A100 (~1,000 samples/s, run.log) — one training step costs ~3 denoiser-
equivalent passes (fwd+bwd), i.e. the A100 sustains ~3,000 denoiser-fwd-
equivalents/s. We use that as the cross-accelerator baseline for
denoise steps/sec/chip.

vs_cpu_x (round 4): the BASELINE ">= 20x vs CPU" target is checked against
a MEASURED denominator, not an estimate: bench.py re-times the reference's
own 60-step CPU loop in-run (dhg/tools/bench_reference_cpu.py imports
/root/reference's real model + step rules; charitable no-grad variant) and
divides by the per-call-fenced p50. If the reference import fails, the
2026-08-20 measurement on this host is used instead and
cpu_baseline_source says "recorded". Caveat disclosed in the JSON: this
host exposes ONE CPU core (torch single-threaded), so the CPU denominator
is a 1-thread number.

train_compute_dtype (round 4): dhg trains bf16-compute/f32-params (the
TPU-native choice); the reference A100 number is fp32/TF32. The field
makes the dtype asymmetry visible to the driver.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.sampling import infer_seq_len

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
CHUNK = 16  # steps per train device program (Trainer.make_chunk_fn)

T0 = time.monotonic()
RESULT: dict = {}  # raw measurements, filled incrementally by all threads
_LOCK = threading.Lock()
_EMITTED = threading.Event()
# Workers wait on this before any device EXECUTION so background warmups
# never pollute a measurement window (compiles are remote and unaffected).
DEVICE_QUIET = threading.Event()
DEVICE_QUIET.set()
PHASE = ["startup"]


def log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - T0:5.0f}s] {msg}", file=sys.stderr, flush=True)


def put(**kv) -> None:
    with _LOCK:
        RESULT.update(kv)


def phase(name: str) -> None:
    PHASE[0] = name
    log(f"phase: {name}")


def assemble(status: str) -> dict:
    with _LOCK:
        r = dict(RESULT)

    def rnd(x, n):
        return round(x, n) if x is not None else None

    steps_per_sec = r.get("steps_per_sec")
    p50 = r.get("p50")
    rtt = r.get("rtt")
    # Decompose against the RTT FLOOR (min of the trivial-call samples), not
    # the median: transport can't take less than its floor, so p50 - floor is
    # a sound device-time upper bound, where p50 - median can clamp to a
    # misleading 0.0 whenever tunnel jitter pushes the median past the
    # sampler's own p50 (observed: rtt median 44 ms > p50 38 ms).
    rtt_floor = r.get("rtt_floor", rtt)
    train = r.get("train")  # dict or None
    cpu = r.get("cpu") or {**REFERENCE_CPU_MEASURED, "source": "recorded (in-run measurement did not finish)"}
    return {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": rnd(steps_per_sec, 2),
        "unit": "denoiser_fwd/s",
        "vs_baseline": rnd(
            steps_per_sec / A100_DENOISE_FWD_EQUIV_PER_SEC if steps_per_sec else None, 3
        ),
        "p50_line_latency_s": rnd(p50, 4),
        "p50_device_only_s": rnd(max(p50 - rtt_floor, 0.0) if p50 is not None and rtt_floor is not None else None, 4),
        "tunnel_rtt_ms": rnd(rtt * 1000 if rtt is not None else None, 2),
        "tunnel_rtt_floor_ms": rnd(rtt_floor * 1000 if rtt_floor is not None else None, 2),
        "batch": 256,
        "seq_len": r.get("seq_len"),
        "n_diffusion_steps": N_STEPS,
        "trials": TRIALS,
        "throughput_trial_ms_per_call": [round(s * 1000, 1) for s in r.get("sec_trials", [])],
        "throughput_timing": "sustained-dispatch median-of-trials (p50 is per-call fenced)",
        "train_steps_per_sec_batch96": rnd(train["median"], 2) if train else None,
        "train_trials": train["trials"] if train else None,
        "train_vs_a100_10.4": rnd(train["median"] / 10.4, 2) if train else None,
        "train_compute_dtype": train["compute_dtype"] if train else None,
        "train_mfu": rnd(
            train["median"] * TRAIN_FLOPS_PER_STEP_B96 / V5E_BF16_PEAK_FLOPS, 4
        ) if train else None,
        "train_dtype_note": "reference A100 number is fp32/TF32; dhg trains "
        "bf16-compute/f32-params (TPU-native choice)",
        "cpu_baseline_line_s": cpu["line_s"],
        "cpu_baseline_line_s_in_run": cpu.get("line_s_in_run"),
        "cpu_baseline_source": cpu["source"],
        "cpu_baseline_host_note": "1-CPU host, torch single-threaded",
        "vs_cpu_x": rnd(cpu["line_s"] / p50 if p50 else None, 1),
        # Amortized comparison: batch-256 sustained lines/s vs the CPU loop's
        # lines/s. Unlike the per-call vs_cpu_x (whose denominator embeds the
        # tunnel RTT and so swings ~1.5x run-to-run), this is transport-free.
        "vs_cpu_amortized_x": rnd(
            (steps_per_sec / N_STEPS) * cpu["line_s"] if steps_per_sec else None, 1
        ),
        "train_vs_cpu_x": rnd(
            train["median"] / cpu["train_steps_per_sec"], 1
        ) if train else None,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "bench_status": status,
        "bench_wall_s": round(time.monotonic() - T0, 1),
    }


def emit(status: str) -> None:
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    log(f"emitting ({status})")
    print(json.dumps(assemble(status)), flush=True)
    sys.stdout.flush()


def install_guards(deadline_s: float) -> None:
    def on_signal(signum, frame):  # noqa: ARG001
        emit(f"partial (signal {signum} during phase '{PHASE[0]}')")
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    def watchdog():
        while not _EMITTED.is_set():
            left = deadline_s - (time.monotonic() - T0)
            if left <= 0:
                emit(f"partial (deadline {deadline_s:.0f}s during phase '{PHASE[0]}')")
                os._exit(0)
            time.sleep(min(left, 5.0))

    threading.Thread(target=watchdog, daemon=True, name="watchdog").start()


def measure_cpu_baseline() -> dict:
    """Re-measure the reference's CPU line cost in-run (~20 s); fall back
    to the recorded 2026-08-20 measurement if the import breaks."""
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


def make_model_and_params(seq_len: int, dtype=jnp.bfloat16):
    """One JITTED init, shared by every sampler batch size. Eager flax init
    dispatches hundreds of tiny programs — on the axon tunnel each pays a
    remote per-op compile + RTT, measured at ~4.5 min for two concurrent
    eager inits (round 5); jitted it is one program."""
    from dhg.models.denoiser import DiffusionModel

    model = DiffusionModel(num_layers=2, dtype=dtype)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, seq_len, 2)),
        jnp.ones((1, 50), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    return model, params


def build(model, params, batch: int, seq_len: int):
    """The canonical hoisted sampler closure for (batch, seq_len)."""
    from dhg.inference import _sample_jit

    text = jax.random.randint(jax.random.PRNGKey(1), (batch, 50), 1, 73)
    style = jax.random.normal(jax.random.PRNGKey(2), (batch, 14, 1280))

    def sample(k):
        return _sample_jit(model, params, (text, style), batch, seq_len, k, None, "new")

    return sample


def measure_tunnel_rtt(iters: int = 20) -> tuple:
    """(median, min) wall time of a trivial fenced program call — on the
    axon tunnel this is dominated by transport RTT (~35 ms measured round
    2), on a local backend it is ~sub-ms dispatch. The median is reported
    as tunnel_rtt_ms; the MIN is the transport floor used to decompose the
    p50 line latency into device time + transport (jitter can push the
    median above the sampler's own p50, but never the floor)."""

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
    return float(np.median(times)), float(np.min(times))


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


class TrainPrep(threading.Thread):
    """Build the Trainer and compile/warm the chunked train-step program in
    the background. Compiles are remote (device-free); the three warmup
    EXECUTIONS (one c1 chunk + two c2 chunks, 48 steps total — the same
    compile#1/compile#2/steady-state sequence the sequential path pays) wait
    on DEVICE_QUIET so they slot between the main thread's measurement
    windows. Falls back to the plain jit-wrapper path on any AOT surprise.

    After join(): .chunk_call(state, key, counts) runs a steady-state chunk
    and .state is the warmed (layout-stable) TrainState.
    """

    def __init__(self, batch: int = 96):
        super().__init__(name="train-prep", daemon=True)
        self.batch = batch
        self.err: Exception | None = None
        self.chunk_call = None
        self.state = None
        self.compute_dtype = None

    def _quiet_exec(self, fn):
        DEVICE_QUIET.wait()
        return fn()

    def run(self):
        try:
            from dhg.config import DLConfig, fit_config
            from dhg.train import Trainer

            cfg = DLConfig(
                fit_config(
                    config="smoke.yml",
                    **{
                        "training_args.batch_size": self.batch,
                        "training_args.max_files": 256,
                    },
                )
            )
            self.compute_dtype = str(cfg.training_args.compute_dtype or "float32")
            t = Trainer(cfg)
            data = t.load_dataset()
            state = t.init_state(0)
            chunk = t.make_chunk_fn(data)
            jitted, arrays = chunk.jitted, chunk.arrays
            key = jax.random.PRNGKey(0)
            counts = jnp.arange(10_000, 10_000 + CHUNK, dtype=jnp.int32)
            log("train-prep: compiling chunk program (init layouts)")
            try:
                c1 = jitted.lower(state, key, counts, arrays).compile()
                log("train-prep: compile#1 done; warmup exec 1")
                state, rows = self._quiet_exec(lambda: c1(state, key, counts, arrays))
                np.asarray(rows[-1])
                log("train-prep: compiling chunk program (donated layouts)")
                c2 = jitted.lower(state, key, counts, arrays).compile()
                log("train-prep: compile#2 done; warmup execs 2+3")
                for lo in (20_000, 30_000):
                    cts = jnp.arange(lo, lo + CHUNK, dtype=jnp.int32)
                    state, rows = self._quiet_exec(lambda: c2(state, key, cts, arrays))
                np.asarray(rows[-1])
                self.chunk_call = lambda s, k, c: c2(s, k, c, arrays)
            except Exception as e:
                # AOT layout capture is backend-dependent; fall back to the
                # jit wrapper (same programs, compiled at call time).
                log(f"train-prep: AOT path failed ({type(e).__name__}: {e}); jit-wrapper fallback")
                for lo in (10_000, 20_000, 30_000):
                    cts = jnp.arange(lo, lo + CHUNK, dtype=jnp.int32)
                    state, rows = self._quiet_exec(lambda: chunk(state, key, cts))
                    np.asarray(rows[-1])
                self.chunk_call = chunk
            self.state = state
            log("train-prep: ready")
        except Exception as e:
            self.err = e
            log(f"train-prep: FAILED ({type(e).__name__}: {e})")


def bench_training(prep: TrainPrep, steps: int = 32, trials: int = TRIALS) -> dict | None:
    """Fused train-step throughput (steps/s) at the reference's best-run
    batch size on synthetic data — comparable to run.log's ~10.4 steps/s
    on one A100. Median over `trials` windows of `steps` steps, all on the
    warmed steady-state program prepared by TrainPrep."""
    if prep.err is not None or prep.chunk_call is None:
        return None
    state = prep.state
    key = jax.random.PRNGKey(0)
    steps = -(-steps // CHUNK) * CHUNK
    # One warm chunk from THIS thread: warmups ran on the prep thread, and
    # the first dispatch of a program from a new thread pays a measured
    # affinity cost (round-3 serving finding; trial-1 ran 72 vs 97 steps/s
    # without this).
    state, rows = prep.chunk_call(state, key, jnp.arange(40_000, 40_000 + CHUNK, dtype=jnp.int32))
    np.asarray(rows[-1])
    rates = []
    for trial in range(trials):
        t0 = time.perf_counter()
        rows = None
        for lo in range(trial * steps, (trial + 1) * steps, CHUNK):
            counts = jnp.arange(lo, lo + CHUNK, dtype=jnp.int32)
            state, rows = prep.chunk_call(state, key, counts)
        np.asarray(rows[-1])
        rates.append(steps / (time.perf_counter() - t0))
    return {
        "median": float(np.median(rates)),
        "trials": [round(r, 2) for r in rates],
        "compute_dtype": prep.compute_dtype,
    }


def main():
    deadline = float(os.environ.get("DHG_BENCH_DEADLINE_S", "780"))
    install_guards(deadline)
    seq_len = infer_seq_len(PROMPT_LEN)  # 392
    put(seq_len=seq_len)
    key = jax.random.PRNGKey(123)

    # Background workers: everything that can compile/measure off the
    # device path starts immediately.
    cpu_holder: dict = {}

    def cpu_work():
        log("cpu-baseline: starting (torch, reference import)")
        cpu_holder["cpu"] = measure_cpu_baseline()
        put(cpu=cpu_holder["cpu"])
        log(f"cpu-baseline: done ({cpu_holder['cpu']['source']})")

    cpu_thread = threading.Thread(target=cpu_work, daemon=True, name="cpu-baseline")
    cpu_thread.start()

    train_prep = None
    if os.environ.get("DHG_BENCH_TRAIN", "1") == "1":
        train_prep = TrainPrep()
        train_prep.start()

    phase("model-init")
    t_init = time.monotonic()
    model, params = make_model_and_params(seq_len)
    jax.block_until_ready(params)
    log(f"jitted init done in {time.monotonic() - t_init:.0f}s")

    samplers: dict = {}

    def warm_sampler(batch):
        t_c = time.monotonic()
        log(f"sampler b{batch}: build + compile")
        fn = build(model, params, batch, seq_len)
        out = fn(key)
        np.asarray(out)  # compile + one exec (pre-measurement)
        samplers[batch] = fn
        log(f"sampler b{batch}: compiled in {time.monotonic() - t_c:.0f}s")

    t256 = threading.Thread(target=warm_sampler, args=(256,), daemon=True, name="s256")
    t1 = threading.Thread(target=warm_sampler, args=(1,), daemon=True, name="s1")
    t256.start()
    t1.start()

    phase("compile-wait")
    t256.join()
    t1.join()

    # Measurement windows: clear DEVICE_QUIET so train-prep warmup execs
    # (the only background device users) hold off.
    phase("tunnel-rtt")
    DEVICE_QUIET.clear()
    try:
        rtt, rtt_floor = measure_tunnel_rtt()
        put(rtt=rtt, rtt_floor=rtt_floor)
        log(f"rtt = {rtt * 1000:.1f} ms (floor {rtt_floor * 1000:.1f} ms)")

        # Throughput: batch-256 sampler (BASELINE config 5's sweep batch),
        # sustained dispatch, median of TRIALS independent 6-call windows.
        phase("throughput-b256")
        sec_trials = []
        for t in range(TRIALS):
            sec_trials.append(timed_sustained(samplers[256], key, 6, salt=100 * t))
            put(
                sec_trials=list(sec_trials),
                steps_per_sec=N_STEPS * 256 / float(np.median(sec_trials)),
            )
            log(f"b256 trial {t}: {sec_trials[-1] * 1000:.1f} ms/call")

        # Latency: single line, per-call fenced; pool TRIALS x 10 samples.
        phase("latency-b1")
        times_1 = []
        for t in range(TRIALS):
            times_1.append(timed(samplers[1], key, 10, salt=100 * t))
            put(p50=float(np.percentile(np.concatenate(times_1), 50)))
        log(f"p50 = {RESULT['p50'] * 1000:.1f} ms")
    finally:
        DEVICE_QUIET.set()

    if train_prep is not None:
        phase("train-prep-wait")
        train_prep.join()
        phase("train-trials")
        train = bench_training(train_prep)
        if train is not None:
            put(train=train)
            log(f"train = {train['median']:.1f} steps/s")

    phase("cpu-wait")
    cpu_thread.join(timeout=max(5.0, deadline - (time.monotonic() - T0) - 5.0))
    emit("complete")


if __name__ == "__main__":
    main()

"""Production-style serving runtime with continuous batching.

    python -m dhg.serve --experiment_path=<run dir> [--port=8008] \
        [--source=<style image>[,style2.png,...]] [--warmup_buckets=200,400] \
        [--warm_steps=30] [--warm_modes=new,standard,ddim] \
        [--warm_temps=0.7,1.3]

Loads the model once, precompiles the sampler for a set of sequence-length
buckets (so first requests don't pay compile latency), then serves:

  POST /generate   {"prompt": str, "seed": int?, "diffusion_mode": str?,
                    "guidance_scale": float?, "n_steps": int?,
                    "temperature": float?, "style": int | [float, ...]?,
                    "wrap": int?, "line_gap": float?, "align": str?}
      -> {"strokes": [[dx, dy, pen], ...], "seq_len": int, "ms": float}
      With "wrap": paragraph mode — the prompt is word-wrapped into lines
      of <= wrap chars, every line is sampled through the SAME continuous-
      batching queue (sibling lines co-batch with each other and with
      unrelated requests; line i draws noise from seed + i), and the
      response's "strokes" is ONE composed page-level sequence
      (dhg.utils.vis.compose_lines) with "lines" in place of "seq_len".
  GET  /healthz    -> {"ok": true, "buckets": [...], "styles": int,
                       "stats": {...}}

Style bank: --source accepts a comma-separated list of style images; each
becomes an entry in the server's style bank. A request may pick a writer
("style": 1) or blend several ("style": [0.3, 0.7] — one weight per bank
entry, the serving face of `dhg.inference --source2/--style_mix`).
Omitted = entry 0. Style is a TRACED batched input, so per-request styles
ride the same compiled programs and co-batch freely — no warmup cost.

Continuous batching: concurrent requests land in a queue; a single batcher
thread drains compatible requests (same diffusion mode / guidance / length
bucket) inside a short window and runs them as ONE bucketed sampler call,
so K concurrent clients share one device program instead of queuing K
serialized calls. Each request keeps its own PRNG stream (per-sample keys,
dhg.core.sampling.per_sample_noise_streams), so its strokes are the same
whether it runs alone or co-batched — identical noise, float32-tolerance
numerics (XLA re-tiles reductions per batch shape, ~1e-5 drift over the
60-step scan; same-seed replays at the same batch size are bit-identical).
Batch sizes are padded to powers of two to bound the compile cache; prompts
longer than every warmed bucket clamp to the largest warmed bucket (the
model is length-agnostic) so live requests never compile.

Fewer-step sampling: a request may pass "n_steps" (strided sub-schedule,
dhg.core.schedule.strided_beta_set — ~60/k speedup at fidelity cost
measured in PERFORMANCE.md). Every distinct n_steps is a distinct scan
length, i.e. a distinct compiled program per (bucket, batch, mode), so
the server only accepts values in its warmed allowlist (--warm_steps,
default just the canonical 60) and rejects others with 400 — keeping the
no-live-compile guarantee intact rather than letting one exotic request
head-of-line-block the batcher for a multi-minute remote compile.
diffusion_mode is allowlisted the same way (--warm_modes, default
new+standard; add "ddim" to serve the deterministic DDIM sampler), and so
is sampling temperature (--warm_temps; 1.0 — the reference behavior — is
always allowed; a request's "temperature" scales x_T and all injected
noise for neater/wilder handwriting, dhg.core.sampling).

Graceful shutdown: SIGTERM (what cluster preemption sends) or SIGINT stops
the listener, drains — new requests get 503, queued + in-flight ones finish
— then exits; GenerationService.shutdown() exposes the same drain to
embedders.

Distilled checkpoints (dhg/distill.py): when the experiment's config
carries training_args.distilled_steps, n_steps requests coarsen on the
"halved" grid the student was trained on (not "strided"), unspecified
requests default to (n_steps=distilled_steps, ddim), and main() auto-warms
both — so serving a student is the same one-liner as serving a teacher.

Capability superset of the reference (which has no serving path at all).
"""

from __future__ import annotations

import json
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dhg.core.sampling import infer_seq_len
from dhg.data.tokenizer import Tokenizer

# Power-of-two co-batch sizes; a service instance uses the prefix of this
# grid up to its max_batch (default 16; raise via --max_batch to warm and
# serve bigger co-batches — the chip's throughput sweet spot is batch 256,
# PERFORMANCE.md hoist sweep, so a throughput tier wants 32-64+).
BATCH_SIZES = (1, 2, 4, 8, 16, 32, 64, 128, 256)


class Draining(RuntimeError):
    """Raised for requests arriving after shutdown() began — HTTP 503."""


@dataclass
class _Pending:
    tokens: list[int]
    seed: int
    mode: str
    guidance: float | None
    bucket: int
    n_steps: int | None = None  # None = canonical 60-step schedule
    temperature: float = 1.0  # sampling temperature (static jit arg)
    style_w: tuple[float, ...] | None = None  # bank weights; None = entry 0
    done: threading.Event = field(default_factory=threading.Event)
    result: np.ndarray | None = None
    seq_len: int = 0
    error: Exception | None = None

    def group_key(self):
        # Bucket is part of the key: a request's noise stream depends on the
        # sequence length it samples at, so co-batching across buckets would
        # break the solo-vs-batched determinism contract. n_steps changes
        # both the program (scan length) and the noise draw count;
        # temperature is a static jit arg (distinct compiled program).
        # style_w is NOT in the key: styles are per-row traced inputs, so
        # requests with different styles co-batch in one program.
        return (self.mode, self.guidance, self.bucket, self.n_steps, self.temperature)


class GenerationService:
    """Owns the model, style vector, tokenizer, compile cache, and the
    continuous-batching queue."""

    def __init__(
        self,
        model,
        params,
        style,
        max_text_len: int = 50,
        batch_window_ms: float = 5.0,
        max_batch: int = 16,
        max_page_lines: int = 64,
    ):
        self.model = model
        self.params = params
        # Style BANK [S, 14, 1280]: entry 0 is the default; requests select
        # an entry by index or blend entries with a weight vector. A single
        # [1, 14, 1280] style (the pre-bank call shape) is a bank of one.
        self.styles = jnp.asarray(style)
        self.tokenizer = Tokenizer()
        self.max_text_len = max_text_len
        self.batch_window = batch_window_ms / 1000.0
        self.max_batch = max_batch
        if max_batch not in BATCH_SIZES:
            raise ValueError(
                f"max_batch must be one of {BATCH_SIZES}, got {max_batch}"
            )
        self.batch_sizes = tuple(b for b in BATCH_SIZES if b <= max_batch)
        # Paragraph-mode page cap: every wrapped line is a sampler job, so
        # an unbounded prompt would enqueue thousands of jobs and head-of-
        # line-block other clients. Pages over this many lines get a 400.
        self.max_page_lines = max_page_lines
        # How n_steps coarsens the schedule: "strided" for ordinary models,
        # "halved" for progressively-distilled students (set by
        # from_experiment from config training_args.distilled_steps — a
        # property of the checkpoint, not of individual requests).
        self.schedule = "strided"
        self.distilled_steps: int | None = None
        self.buckets: list[int] = []
        # n_steps values accepted from requests. None = the canonical
        # 60-step schedule, always allowed. Extra values land here via
        # warmup(steps=...) AFTER their programs are compiled.
        self.allowed_steps: set[int | None] = {None}
        # Diffusion modes accepted from requests; filled by warmup().
        # Mode is a STATIC jit arg, so an arbitrary mode string would
        # compile a fresh program (identical to "new" — unknown modes
        # fall through) mid-request. Empty = no warmup ran, accept all.
        self.allowed_modes: set[str] = set()
        # Sampling temperatures accepted from requests. Temperature is a
        # static jit arg like n_steps (distinct program per value), so only
        # warmed values are accepted; 1.0 is the default program, always
        # allowed. Extras land here via warmup(temps=...).
        self.allowed_temps: set[float] = {1.0}
        self.stats = {
            "requests": 0,
            "batches": 0,
            "largest_batch": 0,
            "last_batch_ms": 0.0,
            "max_batch_ms": 0.0,
            "slow_batches": 0,  # batches over slow_ms (observability for
            # tail anomalies like PERFORMANCE.md's first-burst stall)
        }
        self.slow_ms = 2000.0
        self._warming = False  # warmup compiles are expected-slow; don't warn

        self._queue: deque[_Pending] = deque()
        self._cv = threading.Condition()
        self._draining = False  # True: refuse new requests (503)
        self._stopped = False  # True: batcher thread exits when idle
        self._inflight = 0  # groups currently inside _serve_group
        self._batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self._batcher.start()

    @classmethod
    def from_experiment(
        cls,
        experiment_path: str,
        source: str | None = None,
        max_batch: int = 16,
        batch_window_ms: float = 5.0,
    ):
        from dhg.checkpoint import load_model, resolve_checkpoint
        from dhg.config import DLConfig

        exp = Path(experiment_path)
        ckpt = resolve_checkpoint(exp)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint under {experiment_path}")
        model, params = load_model(exp / "config.yml", ckpt)
        cfg = DLConfig.load(exp / "config.yml")
        if source:
            from dhg.inference import style_from_image

            paths = [s for s in str(source).split(",") if s.strip()]
            # Embed with the trunk the run trained against (same fallback
            # chain as dhg.inference.infer: config's style_weights, then
            # the repo default).
            style = jnp.concatenate(
                [
                    jnp.asarray(
                        style_from_image(
                            p.strip(),
                            style_weights=cfg.dataset_args.style_weights,
                        )
                    )
                    for p in paths
                ]
            )
        else:
            style = jnp.zeros((1, 14, 1280))
        service = cls(
            model, params, style, max_batch=max_batch, batch_window_ms=batch_window_ms
        )
        if cfg.training_args.distilled_steps:
            service.schedule = "halved"
            service.distilled_steps = int(cfg.training_args.distilled_steps)
        return service

    # -- bucketing ----------------------------------------------------------

    def bucket_for(self, n_tokens: int) -> int:
        """Smallest warmed bucket covering the prompt.

        A prompt longer than every warmed bucket CLAMPS to the largest
        warmed one instead of falling through to its exact length — the
        model is length-agnostic (reference tests/test_model.py exercises
        T=400 vs config 480), so it still generates; the output is simply
        capped at the bucket length. This keeps warmup()'s no-live-compile
        guarantee true: an un-warmed exact length would trigger a 1-6 min
        remote compile mid-request, head-of-line-blocking the batcher.
        Falls back to the exact length only when nothing is warmed yet."""
        exact = infer_seq_len(n_tokens)
        for b in sorted(self.buckets):
            if b >= exact:
                return b
        return max(self.buckets) if self.buckets else exact

    def _pad_batch_size(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return n

    def warmup(self, buckets: list[int], modes: tuple[str, ...] = ("new", "standard"),
               guided: bool = False, steps: tuple[int, ...] = (),
               temps: tuple[float, ...] = ()) -> None:
        """Precompile every (bucket, padded batch size, mode) sampler program
        so no live request — solo or co-batched — pays compile latency for a
        warmed variant. Round-2 measurement: without the batch-size warmup,
        the first 16-concurrent burst took 41 s (two fresh compiles) vs
        0.33 s warm.

        Warmup runs THROUGH the batcher queue, not by calling the sampler
        directly: the first dispatch of a program from a fresh thread pays
        a thread-affinity cost even when the program is already compiled
        (measured round 3: 0.5 s in a minimal probe, 10.5 s for the first
        live batch of a 2-bucket server — PERFORMANCE.md serving section),
        so main-thread warmup would leave that cost for the first live
        burst. Enqueueing synthetic groups exercises the exact live path:
        batcher thread, grouping, padding, program, D2H.

        Coverage: both diffusion modes are warmed by default. Guided
        requests share ONE program per (bucket, batch, mode) regardless of
        guidance_scale (the scale is traced, not static — dhg.inference.
        _sample_jit), so guided=True adds exactly one extra variant per
        combination; it defaults off since the guided program roughly
        doubles compile count. A request hitting an un-warmed variant pays
        a one-time compile (head-of-line for the batcher) — the program is
        cached afterwards.

        steps: extra fewer-step n_steps values to warm and thereafter
        accept from requests (each multiplies the program count by the
        bucket x mode x batch grid, hence opt-in and empty by default).

        temps: extra sampling temperatures to warm/accept, same contract
        as steps (temperature is a static jit arg; 1.0 = the default
        program, always allowed)."""
        from dhg.core.schedule import N_STEPS

        scales = [None] + ([2.0] if guided else [])
        steps_values = [None] + sorted({int(s) for s in steps} - {N_STEPS})
        temp_values = [1.0] + sorted({float(t) for t in temps} - {1.0})
        self._warming = True
        try:
            for seq_len in buckets:
                for mode in modes:
                    for g in scales:
                        for k in steps_values:
                            for tau in temp_values:
                                for b in self.batch_sizes:
                                    group = [
                                        _Pending(
                                            [3, 1], i, mode, g, seq_len,
                                            n_steps=k, temperature=tau,
                                        )
                                        for i in range(b)
                                    ]
                                    with self._cv:
                                        self._queue.extend(group)
                                        self._cv.notify_all()
                                    for p in group:
                                        p.done.wait()
                                        if p.error is not None:
                                            raise p.error
                self.buckets.append(seq_len)
            self.allowed_steps.update(steps_values)
            self.allowed_modes.update(modes)
            self.allowed_temps.update(temp_values)
        finally:
            self._warming = False
        with self._cv:  # warmup traffic is not serving traffic
            self.stats.update(
                requests=0, batches=0, largest_batch=0,
                last_batch_ms=0.0, max_batch_ms=0.0, slow_batches=0,
            )

    # -- the batched sampler call --------------------------------------------

    def _run_bucket(self, token_lists, seeds, seq_len, mode, guidance,
                    n_steps=None, temperature=1.0, style_ws=None) -> np.ndarray:
        """ONE sampler program for a group of requests sharing a bucket."""
        from dhg.inference import generate

        n = len(token_lists)
        b = self._pad_batch_size(n)
        text = np.zeros((b, self.max_text_len), np.int32)
        for i, toks in enumerate(token_lists):
            text[i, : len(toks)] = toks
        # Per-request noise streams; padding rows reuse key 0.
        keys = jnp.stack(
            [jax.random.PRNGKey(seeds[i] if i < n else 0) for i in range(b)]
        )
        # Per-request style rows from the bank (padding rows reuse entry 0);
        # a traced input, so mixed-style groups share one compiled program.
        # Keep the common all-default case a zero-copy broadcast, and mixed
        # groups ONE device op (weight matrix built host-side) — per-row
        # device calls would pay the per-dispatch tunnel cost (DEVNOTES).
        if style_ws is None or all(w is None for w in style_ws):
            style = jnp.broadcast_to(self.styles[:1], (b,) + self.styles.shape[1:])
        else:
            n_bank = int(self.styles.shape[0])
            default_w = (1.0,) + (0.0,) * (n_bank - 1)
            wmat = np.asarray(
                [
                    (style_ws[i] if i < n and style_ws[i] is not None else default_w)
                    for i in range(b)
                ],
                dtype=np.float32,
            )
            style = jnp.einsum("bs,shw->bhw", jnp.asarray(wmat), self.styles)
        out = generate(
            self.model,
            self.params,
            jnp.asarray(text),
            style,
            jax.random.PRNGKey(0),
            seq_len=seq_len,
            diffusion_mode=mode,
            guidance_scale=guidance,
            sample_keys=keys,
            n_steps=n_steps,
            schedule=self.schedule,
            temperature=temperature,
        )
        return np.asarray(out[:n])

    # -- the batcher thread ---------------------------------------------------

    def _batch_loop(self):
        while True:
            with self._cv:
                while not self._queue:
                    if self._stopped:
                        return
                    self._cv.wait()
                first = self._queue.popleft()
                self._inflight += 1
            group = [first]
            deadline = time.perf_counter() + self.batch_window
            while len(group) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                with self._cv:
                    take = [
                        p for p in self._queue if p.group_key() == first.group_key()
                    ][: self.max_batch - len(group)]
                    for p in take:
                        self._queue.remove(p)
                    if not take:
                        self._cv.wait(timeout=remaining)
                group.extend(take)
            self._serve_group(group)

    def _serve_group(self, group: list[_Pending]):
        try:
            bucket = group[0].bucket
            t0 = time.perf_counter()
            out = self._run_bucket(
                [p.tokens for p in group],
                [p.seed for p in group],
                bucket,
                group[0].mode,
                group[0].guidance,
                n_steps=group[0].n_steps,
                temperature=group[0].temperature,
                style_ws=[p.style_w for p in group],
            )
            ms = (time.perf_counter() - t0) * 1000
            if ms > self.slow_ms and not self._warming:
                logging.getLogger(__name__).warning(
                    "slow batch: n=%d bucket=%d mode=%s took %.0f ms",
                    len(group), bucket, group[0].mode, ms,
                )
            with self._cv:  # stats are read by /healthz from request threads
                self.stats["batches"] += 1
                self.stats["largest_batch"] = max(self.stats["largest_batch"], len(group))
                self.stats["last_batch_ms"] = round(ms, 1)
                self.stats["max_batch_ms"] = max(self.stats["max_batch_ms"], round(ms, 1))
                self.stats["slow_batches"] += ms > self.slow_ms
            for i, p in enumerate(group):
                p.seq_len = bucket
                p.result = out[i, : infer_seq_len(len(p.tokens))]
                p.done.set()
        except Exception as e:  # surface errors to every waiting request
            for p in group:
                p.error = e
                p.done.set()
        finally:
            with self._cv:
                self._inflight -= 1
                self._cv.notify_all()  # shutdown() waits on queue+inflight

    def shutdown(self, timeout: float = 60.0) -> None:
        """Graceful drain: refuse new requests (Draining -> HTTP 503), wait
        for every queued and in-flight request to finish, then stop the
        batcher thread. Idempotent; safe from any thread. Requests still
        waiting at `timeout` keep running on the daemon batcher, but the
        caller stops blocking on them."""
        deadline = time.monotonic() + timeout
        with self._cv:
            self._draining = True
            while self._queue or self._inflight:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    logging.getLogger(__name__).warning(
                        "shutdown drain timed out with %d queued / %d in flight",
                        len(self._queue), self._inflight,
                    )
                    break
                self._cv.wait(timeout=remaining)
            self._stopped = True
            self._cv.notify_all()
        self._batcher.join(timeout=5.0)

    def stats_snapshot(self) -> dict:
        """Consistent stats copy — all mutations happen under self._cv."""
        with self._cv:
            return dict(self.stats)

    # -- request API ----------------------------------------------------------

    def _parse_style(self, style) -> tuple[float, ...] | None:
        """Validate a request's style field against the bank.

        None -> bank entry 0 (default); int -> that entry; list of floats
        (one weight per bank entry) -> linear blend. Raises ValueError
        (-> HTTP 400) on out-of-range indices, wrong-length weight vectors,
        or non-finite weights."""
        n_bank = int(self.styles.shape[0])
        if style is None:
            return None
        if isinstance(style, bool):
            raise ValueError("style must be an int index or a list of weights")
        if isinstance(style, int):
            if not 0 <= style < n_bank:
                raise ValueError(
                    f"style index {style} out of range (bank has {n_bank} "
                    "entries; load more via --source=a.png,b.png,...)"
                )
            return tuple(1.0 if i == style else 0.0 for i in range(n_bank))
        if isinstance(style, (list, tuple)):
            if len(style) != n_bank:
                raise ValueError(
                    f"style weights must have one entry per bank style "
                    f"({n_bank}), got {len(style)}"
                )
            try:
                w = tuple(float(x) for x in style)
            except (TypeError, ValueError):
                raise ValueError("style weights must be numbers") from None
            if not all(np.isfinite(w)):
                raise ValueError("style weights must be finite")
            return w
        raise ValueError("style must be an int index or a list of weights")

    def _make_pending(
        self,
        prompt: str,
        seed: int,
        diffusion_mode: str | None,
        guidance_scale: float | None,
        n_steps: int | None,
        temperature: float | None,
        style,
    ) -> tuple[_Pending, bool]:
        """Validate one line request and build its queue entry (not yet
        submitted). Returns (pending, truncated) — truncated is True when
        the prompt exceeded every warmed bucket and the output will be
        capped at the largest one (see bucket_for)."""
        # Distilled-student serving defaults (mirrors dhg.inference.infer):
        # an unspecified request samples on the student's own halved grid
        # with the DDIM rule it was trained for. Explicit fields win.
        if diffusion_mode is None:
            diffusion_mode = "ddim" if self.distilled_steps else "new"
        if n_steps is None and self.distilled_steps:
            n_steps = self.distilled_steps
        tokens = self.tokenizer.encode(prompt)
        if len(tokens) > self.max_text_len:
            raise ValueError(f"prompt too long ({len(tokens)} tokens > {self.max_text_len})")
        if self.allowed_modes and diffusion_mode not in self.allowed_modes:
            raise ValueError(
                f"diffusion_mode={diffusion_mode!r} not warmed (allowed: "
                f"{sorted(self.allowed_modes)}); start the server with "
                "--warm_modes to enable it"
            )
        if n_steps is not None:
            from dhg.core.schedule import N_STEPS

            n_steps = int(n_steps)
            if n_steps == N_STEPS:
                n_steps = None  # canonical schedule; shares the default program
            elif n_steps not in self.allowed_steps:
                raise ValueError(
                    f"n_steps={n_steps} not warmed (allowed: "
                    f"{sorted(s for s in self.allowed_steps if s)} + {N_STEPS}); "
                    "start the server with --warm_steps to enable it"
                )
        temperature = 1.0 if temperature is None else float(temperature)
        if temperature != 1.0 and temperature not in self.allowed_temps:
            raise ValueError(
                f"temperature={temperature} not warmed (allowed: "
                f"{sorted(self.allowed_temps)}); start the server with "
                "--warm_temps to enable it"
            )
        style_w = self._parse_style(style)
        bucket = self.bucket_for(len(tokens))
        truncated = bucket < infer_seq_len(len(tokens))
        req = _Pending(
            tokens, seed, diffusion_mode, guidance_scale, bucket, n_steps,
            temperature=temperature, style_w=style_w,
        )
        return req, truncated

    def _submit(self, reqs: list[_Pending]) -> None:
        """Enqueue pendings atomically (all or 503) and wake the batcher."""
        with self._cv:
            if self._draining:
                raise Draining("server is draining; not accepting new requests")
            self._queue.extend(reqs)
            self.stats["requests"] += 1
            self._cv.notify_all()

    def generate_line(
        self,
        prompt: str,
        seed: int = 0,
        diffusion_mode: str | None = None,
        guidance_scale: float | None = None,
        n_steps: int | None = None,
        temperature: float | None = None,
        style=None,
    ) -> tuple[np.ndarray, int, float, bool]:
        req, truncated = self._make_pending(
            prompt, seed, diffusion_mode, guidance_scale, n_steps, temperature, style
        )
        t0 = time.perf_counter()
        self._submit([req])
        req.done.wait()
        if req.error is not None:
            raise req.error
        ms = (time.perf_counter() - t0) * 1000
        return req.result, req.seq_len, ms, truncated

    def generate_page(
        self,
        prompt: str,
        wrap: int,
        seed: int = 0,
        line_gap: float | None = None,
        align: str = "left",
        **line_kwargs,
    ) -> tuple[np.ndarray, int, float, bool]:
        """Paragraph request: word-wrap the prompt, sample every line through
        the SAME continuous-batching queue (sibling lines share a group key,
        so they co-batch with each other — and with unrelated requests — in
        one device program per bucket), then compose one page-level stroke
        sequence (dhg.utils.vis.compose_lines).

        Line i draws noise from seed + i, so a page's lines are mutually
        independent and the page is reproducible from its base seed.
        Returns (page_strokes, n_lines_sampled, ms, truncated_any).
        """
        from dhg.inference import wrap_text
        from dhg.utils.vis import compose_lines

        if align not in ("left", "center"):
            raise ValueError(f"unknown align {align!r} (expected left or center)")
        if wrap + 1 > self.max_text_len:
            raise ValueError(
                f"wrap={wrap} + EOS exceeds max_text_len={self.max_text_len}; "
                f"use wrap <= {self.max_text_len - 1}"
            )
        wrapped = wrap_text(prompt, int(wrap))
        if not any(ln for ln in wrapped):
            raise ValueError("prompt has no printable content to wrap")
        if len(wrapped) > self.max_page_lines:
            raise ValueError(
                f"page too long ({len(wrapped)} wrapped lines > "
                f"max_page_lines={self.max_page_lines}); split the prompt "
                "into multiple requests"
            )
        reqs: list[_Pending | None] = []
        truncated = False
        for i, ln in enumerate(wrapped):
            if not ln:
                reqs.append(None)  # blank line -> paragraph gap slot
                continue
            req, trunc = self._make_pending(ln, seed + i, **{
                "diffusion_mode": line_kwargs.get("diffusion_mode"),
                "guidance_scale": line_kwargs.get("guidance_scale"),
                "n_steps": line_kwargs.get("n_steps"),
                "temperature": line_kwargs.get("temperature"),
                "style": line_kwargs.get("style"),
            })
            truncated = truncated or trunc
            reqs.append(req)
        live = [r for r in reqs if r is not None]
        t0 = time.perf_counter()
        self._submit(live)
        for r in live:
            r.done.wait()
        errs = [r.error for r in live if r.error is not None]
        if errs:
            raise errs[0]
        page = compose_lines(
            [None if r is None else r.result for r in reqs],
            line_gap=line_gap,
            align=align,
        )
        ms = (time.perf_counter() - t0) * 1000
        return page, len(live), ms, truncated


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(
                    200,
                    {"ok": True, "buckets": sorted(service.buckets),
                     "warm_steps": sorted(s for s in service.allowed_steps if s),
                     "warm_modes": sorted(service.allowed_modes),
                     "warm_temps": sorted(service.allowed_temps),
                     "styles": int(service.styles.shape[0]),
                     "stats": service.stats_snapshot()},
                )
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req["prompt"]
                common = dict(
                    seed=int(req.get("seed", 0)),
                    diffusion_mode=req.get("diffusion_mode"),
                    guidance_scale=req.get("guidance_scale"),
                    n_steps=req.get("n_steps"),
                    temperature=req.get("temperature"),
                    style=req.get("style"),
                )
                if req.get("wrap") is not None:
                    # Paragraph mode: wrapped lines co-batch through the
                    # same queue, composed into one page (generate_page).
                    page, n_lines, ms, truncated = service.generate_page(
                        prompt,
                        wrap=int(req["wrap"]),
                        line_gap=req.get("line_gap"),
                        align=req.get("align", "left"),
                        **common,
                    )
                    self._send(
                        200,
                        {
                            "strokes": np.round(page, 5).tolist(),
                            "lines": n_lines,
                            "ms": round(ms, 2),
                            "truncated": truncated,
                        },
                    )
                    return
                strokes, seq_len, ms, truncated = service.generate_line(
                    prompt, **common
                )
                self._send(
                    200,
                    {
                        "strokes": np.round(strokes, 5).tolist(),
                        "seq_len": seq_len,
                        "ms": round(ms, 2),
                        # True when the prompt exceeded every warmed bucket
                        # and the output was capped at the largest one —
                        # the line may stop mid-text (see bucket_for).
                        "truncated": truncated,
                    },
                )
            except Draining as e:
                self._send(503, {"error": str(e)})
            except (KeyError, ValueError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet; the service has its own logs
            pass

    return Handler


class _Server(ThreadingHTTPServer):
    # The socketserver default listen backlog is 5: a burst of >= ~32
    # simultaneous connects overflows the kernel accept queue and later
    # SYNs get RST (measured round 4: 49/512 requests died with
    # ConnectionResetError at 128 concurrent clients). A continuous-
    # batching server EXPECTS bursts of max_batch+ concurrent connects.
    request_queue_size = 512


def serve(service: GenerationService, port: int = 8008, warmup_buckets=(200, 400),
          warmup_modes: tuple[str, ...] = ("new", "standard"), warmup_guided: bool = False,
          warm_steps: tuple[int, ...] = (), warm_temps: tuple[float, ...] = ()):
    service.warmup(list(warmup_buckets), modes=warmup_modes, guided=warmup_guided,
                   steps=warm_steps, temps=warm_temps)
    httpd = _Server(("127.0.0.1", port), make_handler(service))
    return httpd


def main(argv=None):
    import sys

    from dhg.config import parse_cli_kwargs

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    service = GenerationService.from_experiment(
        kw["experiment_path"],
        source=kw.get("source"),
        max_batch=int(kw.get("max_batch", 16)),
        batch_window_ms=float(kw.get("batch_window_ms", 5.0)),
    )
    # "--warmup_buckets=" (empty; yaml-parses to None) skips warmup entirely
    # — useful for smoke tests; production launches keep the default warm
    # buckets.
    raw_buckets = kw.get("warmup_buckets", "200,400")
    raw_buckets = "" if raw_buckets is None else str(raw_buckets)
    buckets = [int(b) for b in raw_buckets.split(",") if b.strip()]
    raw_steps = kw.get("warm_steps", "")
    raw_steps = "" if raw_steps is None else str(raw_steps)
    warm_steps = tuple(int(s) for s in raw_steps.split(",") if s.strip())
    raw_modes = kw.get("warm_modes", "new,standard")
    raw_modes = "" if raw_modes is None else str(raw_modes)
    warm_modes = tuple(m.strip() for m in raw_modes.split(",") if m.strip())
    raw_temps = kw.get("warm_temps", "")
    raw_temps = "" if raw_temps is None else str(raw_temps)
    warm_temps = tuple(float(t) for t in raw_temps.split(",") if t.strip())
    if service.distilled_steps:
        # A distilled student's serving defaults are its own halved grid +
        # DDIM (generate_line) — warm them so the defaults never compile live.
        if service.distilled_steps not in warm_steps:
            warm_steps = warm_steps + (service.distilled_steps,)
        if "ddim" not in warm_modes:
            warm_modes = warm_modes + ("ddim",)
    httpd = serve(service, port=int(kw.get("port", 8008)), warmup_buckets=buckets,
                  warmup_modes=warm_modes, warm_steps=warm_steps, warm_temps=warm_temps)
    print(f"dhg serving on 127.0.0.1:{httpd.server_address[1]} (buckets {buckets})")

    # Graceful shutdown on SIGTERM (cluster preemption) and SIGINT: stop
    # accepting, let queued + in-flight requests finish, then exit. The
    # handler must not call httpd.shutdown() inline — it runs on the main
    # thread UNDER serve_forever's frame, and shutdown() blocks until
    # serve_forever exits (deadlock); hand it to a helper thread. Installed
    # explicitly because detached processes inherit SIGINT=SIG_IGN
    # (DEVNOTES round-3) — same rationale as dhg.train's handlers.
    import signal

    def _stop(signum, frame):
        logging.getLogger(__name__).info("signal %d: draining...", signum)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _stop)
        except ValueError:  # not the main thread (embedded use)
            break
    httpd.serve_forever()
    service.shutdown()
    httpd.server_close()
    print("dhg server stopped (drained)")


if __name__ == "__main__":
    main()

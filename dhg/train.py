"""Training runtime — one donated jitted step, SPMD over a device mesh.

Re-designs the reference TrainingLoop (train.py:21-189) TPU-first:

  * the ENTIRE step — random batch gather from the device-resident cache,
    alpha_bar sampling, noise, forward, loss, grad, clip, Adam update —
    is one jitted program with donated state; the reference instead pays a
    fresh DataLoader iterator, H2D copies, and 3 .item() D2H syncs per step
    (train.py:98, 77-80, 65-67);
  * loss scalars stay on device and are only fetched at log boundaries;
  * data parallelism: batch sharded over the 'data' mesh axis; gradient
    psum inserted by XLA. Tensor seams over 'model' via
    dhg.parallel.sharding (the reference has no distributed path at all);
  * optimizer parity: Noam LR schedule lr = d_model^-0.5 * min(n^-0.5,
    n*warmup^-1.5) with d_model = 2*channels and n starting at 1
    (scheduler.py:16-29); torch-Adam semantics — L2 weight decay folded
    into the gradient BEFORE the moments (not AdamW), eps=1e-8; global-norm
    grad clip on raw grads (train.py:57-62).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dhg.checkpoint import AsyncSaver, save_checkpoint
from dhg.config import DLConfig, config_entrypoint, object_from_dict
from dhg.core.losses import diffusion_loss
from dhg.core.schedule import get_alpha_set, sample_alphas
from dhg.data.pipeline import DeviceDataset, synthetic_cache
from dhg.models.denoiser import DiffusionModel
from dhg.parallel import distributed as dist
from dhg.parallel.mesh import DATA_AXIS, make_mesh, replicated
from dhg.parallel.sharding import param_shardings
from dhg.utils.experiment import log_artifacts, prepare_exp

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, None: None}


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Exponential moving average of params (training_args.ema_decay > 0);
    # None when EMA is off (the reference default — it has no EMA at all).
    ema_params: Any = None


def _append_jsonl(path: Path, record: dict) -> None:
    """Append one machine-readable metrics record (metrics.jsonl in the run
    dir — observability superset; the reference only writes run.log text,
    utils/log.py:44-60). Plot with `python -m dhg.tools.plot_run`."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def noam_schedule(d_model: int, warmup_steps: int, lr_mul: float = 1.0):
    """lr(n) = lr_mul * d_model^-0.5 * min(n^-0.5, n * warmup^-1.5), n >= 1."""

    def schedule(count):
        n = jnp.asarray(count, jnp.float32) + 1.0
        return lr_mul * d_model**-0.5 * jnp.minimum(n**-0.5, n * warmup_steps**-1.5)

    return schedule


def clip_transform(value: float, mode: str = "norm") -> optax.GradientTransformation:
    """Gradient clipping dispatch — modes norm | value | agc
    (reference utils/clip_grad.py:27-49; agc is the NFNet adaptive clip)."""
    if mode == "norm":
        return optax.clip_by_global_norm(value)
    if mode == "value":
        return optax.clip(value)
    if mode == "agc":
        return optax.adaptive_grad_clip(value, eps=1e-3)
    raise KeyError(f"Unknown clip mode ({mode}).")


def make_optimizer(
    cfg: DLConfig, lr_override: float | None = None
) -> optax.GradientTransformation:
    """Build the optax chain from the reference YAML optimizer schema.

    lr_override: replace the Noam schedule with a CONSTANT learning rate
    (same Adam/clip chain). Used by dhg.distill --lr: a distill run starts
    from converged teacher weights, and the ramping Noam schedule that is
    right for from-scratch training walks the student away from the
    teacher once the distill loss has converged (round-5 measurement,
    PERFORMANCE.md "the negative FLIPS")."""
    kind, params = object_from_dict(dict(cfg.optimizer))
    ta = cfg.training_args
    betas = params.get("betas", [0.9, 0.999])
    wd = params.get("weight_decay", 0.0) or 0.0
    if lr_override is not None:
        lr = float(lr_override)
        schedule = lambda _: lr
    else:
        schedule = noam_schedule(ta.channels * 2, ta.warmup_steps, lr_mul=1.0)

    chain: list[optax.GradientTransformation] = []
    if ta.clip_grad is not None:
        chain.append(clip_transform(ta.clip_grad, ta.clip_mode or "norm"))
    if kind == "adam":
        # torch.optim.Adam: weight decay is L2 on the gradient, pre-moments.
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8))
    elif kind == "adamw":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=1e-8))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    elif kind == "sgd":
        pass
    else:  # pragma: no cover
        raise ValueError(kind)
    chain.append(optax.scale_by_schedule(schedule))
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


def load_cache(cfg: DLConfig, kind: str):
    """Packed sample cache for `kind` ('train' | 'validation').

    Synthetic runs (training_args.dataset: synthetic — no IAM files in some
    environments) derive a held-out validation set from the seed (+777,
    n = max(16, max_files // 4)) so it never overlaps the train cache; IAM
    runs read the split from data/splits.json. Validation returns None when
    the split has no samples on disk; an empty train split raises.
    Shared by the Trainer and the standalone `python -m dhg.eval` CLI."""
    ta = cfg.training_args
    if (ta.dataset or "iam") == "synthetic":
        if kind == "validation":
            n = max(16, (ta.max_files or 64) // 4)
            seed = (cfg.experiment.seed or 0) + 777
        else:
            n = ta.max_files or 64
            seed = cfg.experiment.seed or 0
        return synthetic_cache(
            n=n,
            max_seq_len=cfg.dataset_args.max_seq_len or 480,
            max_text_len=cfg.dataset_args.max_text_len or 50,
            seed=seed,
        )
    from dhg.data.iam import load_or_build_cache

    try:
        return load_or_build_cache(
            cache_dir=ta.cache_dir or "./data/cache",
            data_dir=cfg.experiment.data_dir,
            kind=kind,
            splits_file=cfg.experiment.splits_file,
            img_height=cfg.dataset_args.img_height or 96,
            img_width=cfg.dataset_args.img_width or 1400,
            max_text_len=cfg.dataset_args.max_text_len or 50,
            max_seq_len=cfg.dataset_args.max_seq_len or 480,
            max_files=ta.max_files,
            seed=cfg.experiment.seed or 54321,
            style_weights=cfg.dataset_args.style_weights,
        )
    except RuntimeError:  # no samples on disk for this split
        if kind == "validation":
            return None
        raise


class Trainer:
    """Owns model/optimizer/dataset/mesh and the compiled train step."""

    def __init__(self, cfg: DLConfig, mesh=None):
        self.cfg = cfg
        ta = cfg.training_args
        self.compute_dtype = DTYPES.get(ta.compute_dtype, None)
        self.model = DiffusionModel.from_config(ta, dtype=self.compute_dtype)
        self.tx = make_optimizer(cfg)
        self.batch_size = ta.batch_size
        self.alpha_set = get_alpha_set()
        # EMA of params (capability superset — standard practice for
        # diffusion models; the reference has none). 0/None = off.
        self.ema_decay = float(ta.ema_decay or 0.0)
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in [0, 1), got {self.ema_decay}")
        self.grad_accum = int(ta.grad_accum or 1)
        if self.grad_accum < 1 or self.batch_size % self.grad_accum:
            raise ValueError(
                f"grad_accum ({self.grad_accum}) must be >= 1 and divide "
                f"batch_size ({self.batch_size})"
            )

        if mesh is None:
            mesh_cfg = ta.mesh if isinstance(ta.mesh, dict) else {}
            mesh = make_mesh(model_parallel=mesh_cfg.get("model_parallel") or 1)
        self.mesh = mesh
        # Multi-process (multi-host) runs: every process executes the same
        # SPMD program over the GLOBAL mesh; host-side artifacts (run.log,
        # metrics.jsonl, checkpoints) are owned by process 0 only. See
        # dhg/parallel/distributed.py.
        self.write_artifacts = dist.is_main()
        if dist.is_multiprocess() and int(self.mesh.shape.get("model", 1)) > 1:
            # Checkpoint D2H on process 0 requires every param shard to be
            # addressable there; dp-sharding replicates params so that holds,
            # but cross-host tensor parallelism would need a process
            # allgather in the saver (not wired — and a ~10M-param model
            # has no use for cross-host tp).
            raise NotImplementedError(
                "model_parallel > 1 across processes is not supported: "
                "checkpointing would need cross-host gathers; use "
                "data-parallel across hosts (model_parallel spans only "
                "process-local devices)"
            )
        self.saver = AsyncSaver()
        self._eval_step = None

    def eval_fn(self):
        """The jitted validation step, built ONCE and cached — a fresh
        make_eval_fn closure per validation boundary would recompile every
        val_freq steps (~15 s CPU, 1-6 min remote TPU; round-2 verdict #3)."""
        if self._eval_step is None:
            from dhg.eval import make_eval_fn

            self._eval_step = make_eval_fn(self.model)
        return self._eval_step

    # -- state ---------------------------------------------------------------

    def init_state(self, seed: int) -> TrainState:
        key = jax.random.PRNGKey(seed)
        t = self.cfg.dataset_args.max_seq_len or 480
        l = self.cfg.dataset_args.max_text_len or 50
        dummy = (
            jnp.zeros((1, t, 2)),
            jnp.zeros((1, l), jnp.int32),
            jnp.ones((1, 1)),
            jnp.zeros((1, 14, 1280)),
        )
        # jit the init: eagerly, flax dispatches hundreds of tiny programs
        # and on the axon tunnel every one pays a remote per-op compile +
        # RTT (measured minutes of startup, round 5); jitted it is ONE
        # program. Same keys/ops under trace, so params are identical.
        params = jax.jit(self.model.init)(key, *dummy)["params"]
        if self.mesh is not None:
            shardings = param_shardings(params, self.mesh)
            params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = self.tx.init(params)
        # EMA starts as a distinct COPY of params: the jitted step donates
        # the whole state, and aliased leaves across params/ema_params would
        # double-donate the same buffers.
        ema = jax.tree.map(jnp.copy, params) if self.ema_decay else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema,
        )

    # -- data ----------------------------------------------------------------

    def load_dataset(self) -> DeviceDataset:
        # Multi-process: jit inputs must be global arrays, so the packed
        # cache is device_put replicated over the global mesh (every process
        # loads the identical cache — same config, same seed). Single
        # process keeps the uncommitted-upload path (replicating would copy
        # the cache onto every local device for nothing).
        sharding = replicated(self.mesh) if dist.is_multiprocess() else None
        return DeviceDataset.from_cache(load_cache(self.cfg, "train"), sharding=sharding)

    # -- the step ------------------------------------------------------------

    def make_step_fn(self, data: DeviceDataset):
        """One jitted, state-donating training step: step(state, key).

        The dataset arrays are bound as jit ARGUMENTS, not closure
        constants — closed-over arrays serialize into the HLO and a
        real-scale cache (IAM or max_files >= ~2k synthetic) exceeds the
        remote-compile request limit (see DeviceDataset.arrays)."""
        step = jax.jit(self._build_step(), donate_argnums=(0,))
        arrays = data.arrays
        return lambda state, key: step(state, key, arrays)

    def make_chunk_fn(self, data: DeviceDataset):
        """K steps per device program: chunk(state, root_key, counts).

        The per-step Python loop pays host dispatch over the axon tunnel
        for EVERY step (plus an eager fold_in program); measured round 3
        this caps training at ~50 steps/s with ±40% run-to-run noise —
        the round-2 "regression" was exactly this noise. Scanning K steps
        inside ONE program is device-bound and stable: 79.5 steps/s median
        (73-84) vs 49.9 (17-62) at batch 96 on the same chip. `counts` is
        the int32[K] step-count vector; the key for step c is
        fold_in(root_key, c), bit-identical to the per-step path, so
        resume/reproducibility semantics are unchanged. One compile per
        distinct K (the Trainer picks chunk ends at log/val/save
        boundaries, so the set of K's is small and stable).
        """
        step = self._build_step()

        def chunk(state: TrainState, root_key: jax.Array, counts: jax.Array, arrays):
            def body(s, c):
                return step(s, jax.random.fold_in(root_key, c), arrays)

            return jax.lax.scan(body, state, counts)

        jitted = jax.jit(chunk, donate_argnums=(0,))
        arrays = data.arrays

        def wrapper(state: TrainState, root_key: jax.Array, counts: jax.Array):
            return jitted(state, root_key, counts, arrays)

        # bench.py AOT-compiles the chunk program in a background thread
        # (remote compiles overlap; see bench.py round-5 notes).
        wrapper.jitted = jitted
        wrapper.arrays = arrays
        return wrapper

    def _build_step(self):
        """step(state, key, arrays) — dataset arrays arrive as an argument
        pytree (see DeviceDataset.arrays for why they must not be closed
        over); make_step_fn/make_chunk_fn bind them at the call layer."""
        model, tx, alpha_set = self.model, self.tx, self.alpha_set
        batch_size = self.batch_size
        mesh = self.mesh
        batch_spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(DATA_AXIS))

        cond_dropout = float(self.cfg.training_args.cond_dropout or 0.0)
        ema_decay = self.ema_decay
        accum = int(self.cfg.training_args.grad_accum or 1)
        # On-device stroke augmentation (dataset_args.augment — superset;
        # the reference has none): per-sample rotate/scale/shear of the
        # delta channels, fused into the jitted step so it costs one tiny
        # einsum and zero host work. Off unless any knob is > 0.
        aug_cfg = self.cfg.dataset_args.augment
        aug = {
            k: float((aug_cfg or {}).get(k) or 0.0) for k in ("scale", "rotate", "shear")
        }
        augment_on = any(v > 0.0 for v in aug.values())
        from dhg.data.pipeline import augment_strokes, gather_batch

        def step(state: TrainState, key: jax.Array, arrays):
            ks = jax.random.split(key, 6 if augment_on else 5)
            k_batch, k_alpha, k_eps, k_drop, k_cond = ks[:5]
            strokes3, text, style = gather_batch(arrays, k_batch, batch_size)
            strokes3 = jax.lax.with_sharding_constraint(strokes3, batch_spec)
            text = jax.lax.with_sharding_constraint(text, batch_spec)
            style = jax.lax.with_sharding_constraint(style, batch_spec)
            if augment_on:
                strokes3 = augment_strokes(ks[5], strokes3, **aug)

            if cond_dropout > 0.0:
                # Classifier-free-guidance training: with prob p per sample,
                # replace the conditioning with the null condition (EOS-only
                # text + zero style) so guidance_scale > 1 at inference has a
                # trained unconditional branch. Superset of the reference.
                drop_b = jax.random.bernoulli(k_cond, cond_dropout, (batch_size,))
                null_text = jnp.zeros_like(text).at[:, 0].set(1)
                text = jnp.where(drop_b[:, None], null_text, text)
                style = jnp.where(drop_b[:, None, None], jnp.zeros_like(style), style)

            x, pen = strokes3[..., :2], strokes3[..., 2]
            alphas = sample_alphas(k_alpha, batch_size, alpha_set)
            eps = jax.random.normal(k_eps, x.shape)
            xt = jnp.sqrt(alphas)[..., None] * x + jnp.sqrt(1.0 - alphas)[..., None] * eps

            def loss_fn(params):
                eps_pred, pen_pred = model.apply(
                    {"params": params},
                    xt,
                    text,
                    jnp.sqrt(alphas),
                    style,
                    deterministic=False,
                    rngs={"dropout": k_drop},
                )
                total, score, pen_loss = diffusion_loss(eps, eps_pred, pen, pen_pred, alphas)
                return total, (score, pen_loss)

            if accum == 1:
                (total, (score, pen_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params
                )
            else:
                # Gradient accumulation (training_args.grad_accum — superset;
                # the reference has none): the SAME batch/alpha/noise draws as
                # accum=1, evaluated in batch_size/accum micro-chunks under a
                # lax.scan so only one chunk's activations are live at a time.
                # diffusion_loss is a per-sample mean, so the equal-chunk
                # average of losses/grads equals the unsplit step EXACTLY when
                # dropout is inactive (pinned in tests/test_grad_accum.py with
                # dropout patched out). With live dropout — including the
                # architectural 0.3 style dropout (TextStyleEncoder, reference
                # text_style.py:91) — each chunk draws its own masks
                # (fold_in(k_drop, chunk)), so the accumulated gradient is a
                # different but equally unbiased sample of the same expected
                # gradient. Memory drops ~accum-fold on the activation side;
                # the grads accumulator adds one params-sized tree (~10M
                # floats at the canonical config).
                mb = batch_size // accum

                def split_chunks(a):
                    return a.reshape((accum, mb) + a.shape[1:])

                chunks = jax.tree.map(split_chunks, (xt, text, alphas, style, eps, pen))

                def micro_loss(params, chunk, k):
                    xt_c, text_c, al_c, style_c, eps_c, pen_c = chunk
                    eps_pred, pen_pred = model.apply(
                        {"params": params},
                        xt_c,
                        text_c,
                        jnp.sqrt(al_c),
                        style_c,
                        deterministic=False,
                        rngs={"dropout": k},
                    )
                    total, score, pen_loss = diffusion_loss(
                        eps_c, eps_pred, pen_c, pen_pred, al_c
                    )
                    return total, (score, pen_loss)

                grad_micro = jax.value_and_grad(micro_loss, has_aux=True)

                def body(carry, xs):
                    grads_sum, loss_sum = carry
                    chunk, i = xs
                    (t, (s, p)), g = grad_micro(state.params, chunk, jax.random.fold_in(k_drop, i))
                    grads_sum = jax.tree.map(jnp.add, grads_sum, g)
                    return (grads_sum, loss_sum + jnp.stack([t, s, p])), None

                zeros = jax.tree.map(jnp.zeros_like, state.params)
                (grads_sum, loss_sum), _ = jax.lax.scan(
                    body, (zeros, jnp.zeros((3,))), (chunks, jnp.arange(accum))
                )
                grads = jax.tree.map(lambda g: g / accum, grads_sum)
                total, score, pen_loss = loss_sum / accum
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if ema_decay:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    state.ema_params,
                    params,
                )
            else:
                ema = state.ema_params  # None when EMA is off
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
            )
            metrics = jnp.stack([total, score, pen_loss])
            return new_state, metrics

        return step

    # -- validation ----------------------------------------------------------

    def load_val_dataset(self):
        """Validation cache: IAM 'validation' split, or a held-out synthetic
        set. Returns None when validation is disabled (no val_freq) or the
        split is empty. (Capability superset: the reference never evaluates
        its validation split, SURVEY §2.)"""
        if not self.cfg.training_args.val_freq:
            return None
        return load_cache(self.cfg, "validation")

    # -- the loop ------------------------------------------------------------

    def resume_state(self, state: TrainState, resume_from: str) -> tuple[TrainState, int]:
        """True resume (params + opt state + step) — a capability the
        reference lacks (its checkpoints are save-only, SURVEY.md §5)."""
        from dhg.checkpoint import load_checkpoint

        import flax.serialization

        restored = load_checkpoint(resume_from)
        params = jax.tree.map(jnp.asarray, restored["params"])
        start = int(restored.get("step", 0))
        opt_state = state.opt_state
        if "opt_state" in restored:
            opt_state = flax.serialization.from_state_dict(
                state.opt_state, restored["opt_state"]
            )
            opt_state = jax.tree.map(jnp.asarray, opt_state)
        ema = None
        if self.ema_decay:
            # Restore the EMA shadow when the checkpoint carries one; a
            # checkpoint from a pre-EMA run restarts the average from the
            # resumed params (jnp.copy: donation-safe, no aliasing).
            src = restored.get("ema_params", restored["params"])
            ema = jax.tree.map(lambda x: jnp.copy(jnp.asarray(x)), src)
        return (
            TrainState(
                step=jnp.asarray(start, jnp.int32),
                params=params,
                opt_state=opt_state,
                ema_params=ema,
            ),
            start,
        )

    def train(self, meta: dict, logger) -> TrainState:
        cfg = self.cfg
        ta = cfg.training_args
        data = self.load_dataset()
        state = self.init_state(cfg.experiment.seed or 0)
        start_step = 0
        if cfg.experiment.resume_from:
            state, start_step = self.resume_state(state, cfg.experiment.resume_from)
            logger.info(f"Resumed from {cfg.experiment.resume_from} at step {start_step}")
        step_fn = self.make_step_fn(data)
        root_key = jax.random.PRNGKey((cfg.experiment.seed or 0) + 1)

        val_cache = self.load_val_dataset()

        logger.info(
            f"Starting train model, host: {meta['host_name']}, exp_dir: {meta['exp_dir']}\n"
        )
        exp_dir = Path(meta["exp_dir"])
        s = time.time()
        window: list[jax.Array] = []

        # Optional jax.profiler trace (TPU-native replacement for the
        # reference's wall-clock-only timing, SURVEY.md §5): set
        # training_args.profile_dir to dump a Perfetto/XProf trace of steps
        # [profile_start, profile_start + profile_steps).
        prof_dir = ta.profile_dir
        prof_start = ta.profile_start or 10
        prof_steps = ta.profile_steps or 5

        # Steps per device program (training_args.steps_per_call: int|"auto").
        # "auto"/unset scans up to 16 steps per call (see make_chunk_fn for
        # the measured why); 1 restores the per-step loop. Profiling forces
        # per-step so the trace window lands on exact step boundaries.
        spc = ta.steps_per_call
        k_max = 16 if spc in (None, "auto") else max(1, int(spc))
        if prof_dir:
            k_max = 1
        chunk_fn = self.make_chunk_fn(data) if k_max > 1 else None

        def _dist(c: int, f: int) -> int:
            """Steps from count c to the next (count+1) % f == 0 boundary."""
            d = (f - (c + 1) % f) % f
            return d if d else f

        try:
            count = start_step
            while count < ta.steps:
                # Chunks end exactly at val/save/termination boundaries so
                # the host has the boundary-step state in hand; log
                # boundaries don't cut chunks (stacked metrics suffice).
                dists = [ta.steps - count, _dist(count, ta.save_freq)]
                if val_cache is not None:
                    dists.append(_dist(count, ta.val_freq))
                k = min(k_max, *dists)
                if 1 < k < k_max:
                    # Round boundary chunks down to a power of two: every
                    # distinct K is its own XLA program (1-6 min remote
                    # compile each — the round-3 10k run paid ~2 min per
                    # odd boundary K), so bound the set at
                    # {k_max, 8, 4, 2, 1} for the cost of at most a few
                    # extra (already-compiled) chunk calls per boundary.
                    k = 1 << (k.bit_length() - 1)

                if k <= 1:
                    count += 1
                    if prof_dir and count == prof_start:
                        jax.profiler.start_trace(str(prof_dir))
                    state, metrics = step_fn(state, jax.random.fold_in(root_key, count))
                    if prof_dir and count == prof_start + prof_steps:
                        jax.block_until_ready(metrics)
                        jax.profiler.stop_trace()
                        logger.info(f"Profiler trace written to {prof_dir}")
                    rows = metrics[None]
                else:
                    counts = jnp.arange(count + 1, count + k + 1, dtype=jnp.int32)
                    state, rows = chunk_fn(state, root_key, counts)
                    count += k

                if _InterruptFlag.pending:
                    # Raised HERE — state freshly rebound, buffers live —
                    # never from the signal handler (see
                    # _install_interrupt_handlers for the donation hazard).
                    _InterruptFlag.pending = False
                    raise KeyboardInterrupt

                # Per-step log bookkeeping over the rows just executed —
                # identical lines/cadence to the per-step loop (the window
                # flushes as [n, 3] device slices; one D2H per log line).
                base = count - int(rows.shape[0])
                j0 = 0
                for c in range(base + 1, count + 1):
                    if (c + 1) % ta.log_freq == 0:
                        window.append(rows[j0 : c - base])
                        j0 = c - base
                        vals = np.asarray(jnp.concatenate(window, 0).mean(0))
                        logger.info(
                            f"Step {c + 1} | "
                            f"Loss: {vals[0]:.3f} | "
                            f"Score: {vals[1]:.3f} | "
                            f"Pen: {vals[2]:.3f} | "
                            f"Time: {time.time() - s:.3f} sec"
                        )
                        if self.write_artifacts:
                            _append_jsonl(
                                exp_dir / "metrics.jsonl",
                                {
                                    "step": c + 1,
                                    "loss": float(vals[0]),
                                    "score": float(vals[1]),
                                    "pen": float(vals[2]),
                                    "time": round(time.time() - s, 3),
                                },
                            )
                        window = []
                if j0 < rows.shape[0]:
                    window.append(rows[j0:])

                if val_cache is not None and (count + 1) % ta.val_freq == 0:
                    from dhg.eval import evaluate

                    v = evaluate(
                        self.model,
                        state.params,
                        val_cache,
                        batch_size=min(self.batch_size, len(val_cache)),
                        seed=cfg.experiment.seed or 0,
                        eval_step=self.eval_fn(),
                    )
                    logger.info(
                        f"Step {count + 1} | Val Loss: {v[0]:.3f} | "
                        f"Val Score: {v[1]:.3f} | Val Pen: {v[2]:.3f}"
                    )
                    if self.write_artifacts:
                        _append_jsonl(
                            exp_dir / "metrics.jsonl",
                            {
                                "step": count + 1,
                                "val_loss": float(v[0]),
                                "val_score": float(v[1]),
                                "val_pen": float(v[2]),
                            },
                        )

                if self.write_artifacts and (count + 1) % ta.save_freq == 0:
                    logger.info("Saving checkpoint...")
                    self.saver.submit(
                        exp_dir / f"checkpoint_{count + 1}",
                        state.params,
                        opt_state=state.opt_state,
                        step=count + 1,
                        meta={"run_name": meta.get("run_name", "")},
                        ema_params=state.ema_params,
                        keep=ta.keep_checkpoints,
                    )

            logger.info("Training finished, saving model weights.")
            if self.write_artifacts:
                self.saver.submit(
                    exp_dir / "model_final", state.params, ema_params=state.ema_params
                )
                self.saver.wait()
                logger.info(str(exp_dir / "model_final"))
        except KeyboardInterrupt:
            logger.info("Training interrupted by user.")
            self.saver.wait()
            if not self.write_artifacts:
                raise SystemExit(0)
            save_checkpoint(
                exp_dir / "checkpoint_last",
                state.params,
                opt_state=state.opt_state,
                step=count,
                ema_params=state.ema_params,
            )
            save_checkpoint(exp_dir / "model_last", state.params, ema_params=state.ema_params)
        finally:
            # Drain queued async saves even on unexpected exceptions — the
            # saver thread is a daemon, so exiting without this would drop
            # in-flight checkpoints silently.
            self.saver.wait()
        return state


class _InterruptFlag:
    """Deferred-interrupt latch shared by the signal handlers and the loop."""

    pending = False


def _install_interrupt_handlers() -> None:
    """Make interrupt-save work for DETACHED runs, not just terminals.

    Two production realities the default dispositions miss:
      * a process launched as a shell background job (`cmd &` in a
        non-interactive shell — any nohup/daemon/driver launch) inherits
        SIGINT as SIG_IGN, and CPython then leaves it ignored — Ctrl-C
        semantics silently vanish and the KeyboardInterrupt save path in
        Trainer.train can never fire (observed on the round-3 10k run);
      * TPU/GPU cluster preemption delivers SIGTERM, which by default
        kills the process without flushing the async checkpointer.

    The handler does NOT raise asynchronously: the train step/chunk call
    donates the old state's buffers, so a KeyboardInterrupt landing inside
    `state, rows = chunk_fn(state, ...)` — after donation invalidated the
    old buffers, before `state` is rebound — would leave the except-block
    saving deleted arrays and lose the checkpoint this feature exists to
    write. Instead the handler latches a flag; Trainer.train raises
    KeyboardInterrupt at the next safe point (state freshly rebound), so
    the interrupt save always sees live buffers. Cost: an interrupt during
    a long remote compile waits for that call to return.
    """
    import signal

    def _latch(signum, frame):
        _InterruptFlag.pending = True

    signal.signal(signal.SIGINT, _latch)  # overrides inherited SIG_IGN
    signal.signal(signal.SIGTERM, _latch)  # preemption-safe checkpointing


def main(cfg: DLConfig) -> None:
    _install_interrupt_handlers()
    # Multi-host: process-group init must precede every other JAX call
    # (it swaps the backend for one that sees the GLOBAL device set).
    dist.initialize_from_config(cfg)
    trainer = Trainer(cfg)
    if dist.is_main():
        meta, logger = prepare_exp(cfg)
        logger.info(f"Config:\n{cfg.pretty_text}\n")
    else:
        # Non-main processes run the identical SPMD compute in lockstep but
        # own no artifacts: no run dir, a silent logger, gated writes
        # (Trainer.write_artifacts). The placeholder exp_dir is never
        # created or written.
        import logging as _logging
        import socket

        meta = {
            "host_name": socket.gethostname(),
            "exp_dir": str(
                Path(cfg.experiment.work_dir or ".")
                / f"nonmain-process-{jax.process_index()}"
            ),
        }
        logger = _logging.getLogger(f"dhg.nonmain{jax.process_index()}")
        logger.addHandler(_logging.NullHandler())
        logger.propagate = False
    trainer.train(meta, logger)
    if dist.is_main():
        log_artifacts(cfg, meta)


if __name__ == "__main__":
    main(config_entrypoint(help_text=__doc__))

"""Progressive distillation — halve the sampler's step count by training.

Capability superset (nothing like it exists in the reference, whose only
sampler is the fixed 60-step loop, inference.py:84-94): following Salimans
& Ho 2022, "Progressive Distillation for Fast Sampling of Diffusion
Models" (arXiv:2202.00512), a STUDENT copy of the teacher learns to match
TWO teacher DDIM steps with ONE of its own, halving the schedule
60 -> 30 -> 15 with one short training round per halving. Unlike the
zero-training strided schedules (dhg/core/schedule.py::strided_beta_set,
whose discretization error grows as k shrinks), a distilled student is
TRAINED to be exact on its coarse grid.

Grid construction: the student's alpha_bar levels are every second point
of the teacher's EXTENDED level array [1.0, abar_0..abar_{N-1}]
(schedule.py::halve_beta_set), so student step i spans exactly teacher
steps 2i+1 then 2i:

    entering level  a_in[i]  = abar_t[2i+1]   (= the student's abar_s[i])
    teacher midpoint a_mid[i] = abar_t[2i]
    exit level      a_out[i] = abar_t[2i-1], or 1.0 at i == 0

Per batch sample: draw a student step i, form x_t = sqrt(a_in) x0 +
sqrt(1-a_in) eps from DATA x0, run the frozen teacher two DDIM hops
x_t -> x_mid -> x_r, then solve for the eps* a single student DDIM step
needs to land on x_r exactly:

    x_r = sqrt(a_out/a_in) (x_t - sqrt(1-a_in) eps*) + sqrt(1-a_out) eps*
    eps* = (x_r - sqrt(a_out/a_in) x_t)
           / (sqrt(1-a_out) - sqrt(a_out/a_in) sqrt(1-a_in))

The loss is the paper's truncated-SNR-weighted x0-space MSE,
w = max(abar/(1-abar), 1) (sec. 4: plain eps-space MSE blows up as
abar -> 0 where eps barely constrains x0). The pen-lift head distills
against the teacher's pen output at (x_t, sigma_t), alpha_bar-weighted
like the reference's pen BCE (loss.py:29-37).

Inference on a distilled run dir picks the halved grid automatically:
config.yml carries training_args.distilled_steps, and dhg.inference.infer
defaults to (n_steps=distilled_steps, schedule="halved", ddim).

CLI:
    python -m dhg.distill --experiment_path=<teacher run dir> \
        [--steps=2000] [--student_steps=30] [--lr=5e-5 constant-LR override]
        [--training_args.xx=yy ...]
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dhg.checkpoint import load_model, resolve_checkpoint, save_checkpoint
from dhg.config import DLConfig, parse_cli_kwargs, update_config
from dhg.core.sampling import ddim_step
from dhg.core.schedule import N_STEPS, get_alpha_set, halved_beta_set
from dhg.data.pipeline import gather_batch
from dhg.train import DTYPES, TrainState, Trainer, make_optimizer


class Distiller:
    """One 2-for-1 halving round: teacher (frozen) -> student (trained).

    cfg is the TEACHER's run config; its training_args.distilled_steps
    (absent = the canonical 60) names the grid the teacher samples on.
    """

    def __init__(
        self,
        cfg: DLConfig,
        teacher_params,
        student_steps: int | None = None,
        lr: float | None = None,
    ):
        ta = cfg.training_args
        self.cfg = cfg
        self.teacher_steps = int(ta.distilled_steps or N_STEPS)
        self.student_steps = int(student_steps or self.teacher_steps // 2)
        if self.teacher_steps != 2 * self.student_steps:
            raise ValueError(
                f"one distillation round halves the grid: teacher "
                f"{self.teacher_steps} -> student {self.teacher_steps // 2}, "
                f"got student_steps={self.student_steps}"
            )
        if self.teacher_steps % 2 != 0:
            raise ValueError(f"teacher grid must be even, got {self.teacher_steps}")

        from dhg.models.denoiser import DiffusionModel

        self.model = DiffusionModel.from_config(ta, dtype=DTYPES.get(ta.compute_dtype, None))
        self.teacher_params = teacher_params
        # --lr: constant-LR override. The teacher config's ramping Noam
        # schedule is right for from-scratch training but over-trains a
        # student that STARTS at the optimum (round-5 measurement:
        # 300 steps under the ramp beat 2000). None keeps the teacher's
        # schedule.
        self.tx = make_optimizer(cfg, lr_override=lr)
        self.batch_size = ta.batch_size

        # Step-index tables (see module docstring). f32 [2k] / [k].
        beta_t = halved_beta_set(self.teacher_steps)
        abar_t = get_alpha_set(beta_t)
        levels = jnp.concatenate([jnp.ones((1,), abar_t.dtype), abar_t])  # [2k+1]
        self.a_in = abar_t[1::2]  # [k]
        self.a_mid = abar_t[0::2]  # [k]
        self.a_out = levels[0::2][: self.student_steps]  # [k]

    # -- state ----------------------------------------------------------------

    def init_state(self) -> TrainState:
        """Student starts as an exact copy of the teacher (paper sec. 3)."""
        params = jax.tree.map(jnp.copy, self.teacher_params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=self.tx.init(params)
        )

    # -- the step ---------------------------------------------------------------

    def make_step_fn(self, data):
        """step(state, key) — jitted, student-state donated; the dataset
        arrays AND teacher params enter as jit arguments (not closure
        constants) so the program stays small at real cache sizes (see
        Trainer.make_step_fn / DeviceDataset.arrays for the measured why).
        """
        step = jax.jit(self._build_step(), donate_argnums=(0,))
        arrays = data.arrays
        teacher = self.teacher_params
        return lambda state, key: step(state, key, arrays, teacher)

    def _build_step(self):
        model, tx = self.model, self.tx
        a_in, a_mid, a_out = self.a_in, self.a_mid, self.a_out
        k, bs = self.student_steps, self.batch_size

        def step(state: TrainState, key: jax.Array, arrays, teacher_params):
            k_batch, k_idx, k_eps = jax.random.split(key, 3)
            strokes3, text, style = gather_batch(arrays, k_batch, bs)
            x0 = strokes3[..., :2]

            i = jax.random.randint(k_idx, (bs, 1), 0, k)
            at, am, ar = a_in[i], a_mid[i], a_out[i]  # [bs, 1] each
            atb, amb, arb = at[..., None], am[..., None], ar[..., None]

            eps = jax.random.normal(k_eps, x0.shape)
            xt = jnp.sqrt(atb) * x0 + jnp.sqrt(1.0 - atb) * eps

            # Frozen teacher: two DDIM hops (no grad flows — targets are
            # computed outside loss_fn and teacher params are never
            # differentiated).
            eps1, pen_t = model.apply({"params": teacher_params}, xt, text, jnp.sqrt(at), style)
            x_mid = ddim_step(xt, eps1, atb, amb)
            eps2, _ = model.apply(
                {"params": teacher_params}, x_mid, text, jnp.sqrt(am), style
            )
            x_r = ddim_step(x_mid, eps2, amb, arb)

            # The eps a one-step student DDIM needs to land on x_r exactly.
            ratio = jnp.sqrt(arb / atb)
            denom = jnp.sqrt(1.0 - arb) - ratio * jnp.sqrt(1.0 - atb)
            eps_star = (x_r - ratio * xt) / denom
            x0_star = (xt - jnp.sqrt(1.0 - atb) * eps_star) / jnp.sqrt(atb)

            def loss_fn(params):
                eps_pred, pen_pred = model.apply({"params": params}, xt, text, jnp.sqrt(at), style)
                x0_pred = (xt - jnp.sqrt(1.0 - atb) * eps_pred) / jnp.sqrt(atb)
                w = jnp.maximum(atb / (1.0 - atb), 1.0)  # truncated SNR
                score = jnp.mean(jnp.sum(w * (x0_pred - x0_star) ** 2, axis=-1))
                pen_l = jnp.mean(jnp.mean((pen_pred - pen_t) ** 2, axis=-1) * at[:, 0])
                return score + pen_l, (score, pen_l)

            (total, (score, pen_l)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            import optax

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
            return new_state, jnp.stack([total, score, pen_l])

        return step

    # -- the loop ---------------------------------------------------------------

    def distill(self, data, steps: int, logger, log_freq: int = 50) -> TrainState:
        state = self.init_state()
        step_fn = self.make_step_fn(data)
        root = jax.random.PRNGKey((self.cfg.experiment.seed or 0) + 99)
        s = time.time()
        window = []
        for c in range(1, steps + 1):
            state, metrics = step_fn(state, jax.random.fold_in(root, c))
            window.append(metrics)
            if c % log_freq == 0 or c == steps:
                vals = np.asarray(jnp.stack(window).mean(0))
                logger.info(
                    f"Distill {self.teacher_steps}->{self.student_steps} | "
                    f"Step {c} | Loss: {vals[0]:.4f} | Score: {vals[1]:.4f} | "
                    f"Pen: {vals[2]:.4f} | Time: {time.time() - s:.3f} sec"
                )
                window = []
        return state


def probe_fidelity(
    model, teacher_params, student_params, teacher_steps: int, student_steps: int, logger
) -> float:
    """Student k-step DDIM vs teacher 2k-step DDIM from the same x_T on a
    fixed probe prompt — the quantity distillation minimizes, logged as the
    round's summary number. Returns the stroke-delta MSE."""
    from dhg.data.tokenizer import Tokenizer
    from dhg.inference import generate, infer_seq_len

    tok = Tokenizer()
    text = jnp.asarray([tok.encode("a probe line of text")], jnp.int32)
    style = jnp.zeros((1, 14, 1280))
    key = jax.random.PRNGKey(1234)
    seq_len = infer_seq_len(text.shape[1])
    kw = dict(seq_len=seq_len, diffusion_mode="ddim", schedule="halved")
    ref = generate(model, teacher_params, text, style, key, n_steps=teacher_steps, **kw)
    out = generate(model, student_params, text, style, key, n_steps=student_steps, **kw)
    mse = float(jnp.mean((ref[..., :2] - out[..., :2]) ** 2))
    logger.info(
        f"Probe: student {student_steps}-step DDIM vs teacher "
        f"{teacher_steps}-step DDIM stroke MSE = {mse:.3e}"
    )
    return mse


def main() -> None:
    kw = parse_cli_kwargs(help_text=__doc__)
    exp_path = kw.pop("experiment_path", None)
    if not exp_path:
        raise SystemExit("--experiment_path=<teacher run dir> is required")
    steps = int(kw.pop("steps", 2000))
    student_steps = kw.pop("student_steps", None)
    probe = bool(kw.pop("probe", True))
    lr = kw.pop("lr", None)
    lr = float(lr) if lr is not None else None
    kw.pop("config", None)  # the teacher's resolved config.yml is the config

    exp = Path(exp_path)
    ckpt = resolve_checkpoint(exp)
    if ckpt is None:
        raise SystemExit(f"no checkpoint found under {exp}")
    cfg = DLConfig.load(exp / "config.yml")
    if kw:
        cfg = DLConfig(update_config(cfg.to_dict(), kw))
    model, teacher_params = load_model(exp / "config.yml", ckpt, cfg_options=kw or None)

    d = Distiller(cfg, teacher_params, student_steps=student_steps, lr=lr)
    d.model = model  # identical construction; keep the loaded instance

    from dhg.utils.experiment import prepare_exp

    out_cfg = DLConfig(
        update_config(
            cfg.to_dict(),
            {
                "experiment.name": f"{cfg.experiment.name}_distill{d.student_steps}",
                "training_args.distilled_steps": d.student_steps,
            },
        )
    )
    meta, logger = prepare_exp(out_cfg)
    logger.info(
        f"Distilling {exp} ({d.teacher_steps} steps) -> {d.student_steps} steps, "
        f"{steps} optimizer steps"
    )

    trainer = Trainer(cfg)  # dataset loading only (same data as the teacher)
    data = trainer.load_dataset()
    state = d.distill(data, steps, logger)

    out_dir = Path(meta["exp_dir"])
    save_checkpoint(out_dir / "model_final", state.params)
    out_cfg.dump(out_dir / "config.yml")
    logger.info(f"Student saved: {out_dir / 'model_final'}")
    if probe:
        probe_fidelity(
            model, teacher_params, state.params, d.teacher_steps, d.student_steps, logger
        )


if __name__ == "__main__":
    main()

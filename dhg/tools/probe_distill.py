"""Cross-level distillation fidelity probe.

Compares, from the SAME x_T on the fixed probe prompt (the same probe
dhg/distill.py::probe_fidelity logs per round):

  1. the ORIGINAL teacher sampled at its full grid (--teacher_steps,
     default 60) — the reference trajectory;
  2. the teacher COPY sampled at the student grid (--student_steps) —
     the zero-training halved-grid discretization baseline;
  3. the distilled STUDENT at the student grid.

Distillation "wins" iff (3) < (2): the trained one-step-for-two
correction must beat simply running the teacher on the coarse grid.
Round-5 measurements on the IAM-scale-tree teacher (val 0.478@4.5k,
PERFORMANCE.md "Progressive distillation on a converged teacher"):
60->30 at 300 distill steps wins (1.63e-4 vs 2.97e-4); over-training
under the teacher's ramping Noam LR loses it (2000 steps: 1.71e-3).

Usage:
    python -m dhg.tools.probe_distill --teacher=<run dir> \
        --student=<distilled run dir> [--teacher_steps=60] \
        [--student_steps=<from student config>] [--prompt="..."]
        [--multi=1]   # probe a fixed 8-prompt batch instead of one line

Ref: reference inference.py:84-94 (the 60-step loop being distilled);
Salimans & Ho 2022 (progressive distillation), dhg/distill.py.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp


def main(argv=None) -> None:
    from dhg.checkpoint import resolve_checkpoint
    from dhg.config import DLConfig, parse_cli_kwargs
    from dhg.data.tokenizer import Tokenizer
    from dhg.inference import generate, infer_seq_len, load_model

    kw = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    teacher = kw.pop("teacher", None)
    student = kw.pop("student", None)
    if not teacher or not student:
        raise SystemExit("--teacher=<run dir> and --student=<run dir> are required")
    teacher_steps = int(kw.pop("teacher_steps", 60))
    prompt = kw.pop("prompt", "a probe line of text")

    model, tparams = load_model(f"{teacher}/config.yml", resolve_checkpoint(teacher))
    scfg = DLConfig.load(f"{student}/config.yml")
    _, sparams = load_model(f"{student}/config.yml", resolve_checkpoint(student))
    student_steps = int(
        kw.pop("student_steps", scfg.training_args.distilled_steps or teacher_steps // 2)
    )

    multi = bool(kw.pop("multi", False))
    tok = Tokenizer()
    if multi:
        # Fixed diverse batch: lengths 11-43 chars, shared padded width.
        prompts = [
            "a probe line of text",
            "the quick brown fox jumps over the lazy dog",
            "Diffusion models write by hand",
            "MMXXVI",
            "pack my box with five dozen jugs",
            "hello world",
            "strokes and pen lifts",
            "Follow the White Rabbit",
        ]
        width = max(len(tok.encode(p)) for p in prompts)
        rows = [tok.encode(p) + [0] * (width - len(tok.encode(p))) for p in prompts]
        text = jnp.asarray(rows, jnp.int32)
    else:
        text = jnp.asarray([tok.encode(prompt)], jnp.int32)
    style = jnp.zeros((text.shape[0], 14, 1280))
    key = jax.random.PRNGKey(1234)
    gen_kw = dict(
        seq_len=infer_seq_len(text.shape[1]), diffusion_mode="ddim", schedule="halved"
    )

    ref = generate(model, tparams, text, style, key, n_steps=teacher_steps, **gen_kw)
    copy = generate(model, tparams, text, style, key, n_steps=student_steps, **gen_kw)
    stud = generate(model, sparams, text, style, key, n_steps=student_steps, **gen_kw)

    def mse(a, b):
        return float(jnp.mean((a[..., :2] - b[..., :2]) ** 2))

    def per_row(a, b):
        return [round(float(v), 6) for v in jnp.mean((a[..., :2] - b[..., :2]) ** 2, axis=(1, 2))]

    out = {
        "teacher_steps": teacher_steps,
        "student_steps": student_steps,
        "n_prompts": int(text.shape[0]),
        "copy_vs_teacher_mse": mse(ref, copy),
        "student_vs_teacher_mse": mse(ref, stud),
        "distillation_wins": mse(ref, stud) < mse(ref, copy),
    }
    if text.shape[0] > 1:
        out["copy_per_prompt"] = per_row(ref, copy)
        out["student_per_prompt"] = per_row(ref, stud)
        wins = sum(
            s < c for s, c in zip(out["student_per_prompt"], out["copy_per_prompt"])
        )
        out["prompts_won"] = f"{wins}/{text.shape[0]}"
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Measure the ACTUAL reference CPU baseline (round-4 verdict item #1).

PERFORMANCE.md's ">= 150x vs CPU" multiplier previously rested on an
estimate ("~100-300 ms/forward -> >= 6-20 s/line"). torch is installed and
the reference imports fine here (the parity suite already does it,
tests/test_reference_model_parity.py), so this tool measures the real
denominator on this host:

  1. sampler: the reference's own 60-step reverse loop
     (/root/reference/diffusion_handwriting_generation/inference.py:84-94)
     at T=392 (the 24-token prompt bucket bench.py uses), batch 1, calling
     the reference's model.forward and step rules (utils/nn.py:64-112)
     verbatim. Measured twice: as shipped (infer() runs WITHOUT
     torch.no_grad, so autograd records the whole 60-step graph) and the
     charitable variant under torch.no_grad. bench.py's vs_cpu_x uses the
     charitable (faster) number.
  2. train step: the sequence of TrainingLoop.train_step
     (/root/reference/diffusion_handwriting_generation/train.py:26-67) at
     batch 96 / T=480 on synthetic tensors, calling the reference's
     get_alphas / loss_fn / dispatch_clip_grad / InvSqrtScheduledOptim.
     (train.py itself cannot be imported here — `addict` is not installed —
     so the orchestration is re-stated; every compute call is the
     reference's own code.)

Run:  python -m dhg.tools.bench_reference_cpu [--sampler_iters=N]
Prints one JSON dict; bench.py embeds the measured medians (see
REFERENCE_CPU_MEASURED there) with provenance.
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np


def import_reference():
    """Import the reference package with the torchvision stub the parity
    tests use (text_style.py:4 imports torchvision; DiffusionModel never
    instantiates StyleExtractor, so a module stub suffices)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import diffusion_handwriting_generation.model as ref_model
    import diffusion_handwriting_generation.loss as ref_loss
    import diffusion_handwriting_generation.scheduler as ref_sched
    import diffusion_handwriting_generation.utils.clip_grad as ref_clip
    import diffusion_handwriting_generation.utils.nn as ref_nn

    return ref_model, ref_loss, ref_sched, ref_clip, ref_nn


def bench_sampler(iters: int = 2, seq_len: int = 392, mode: str = "new") -> dict:
    """Time the reference 60-step reverse-diffusion loop on CPU, batch 1.

    Mirrors inference.py:75-96: x ~ N(0,1) [1,T,2], 60 steps i=59..0, model
    called with sigma=sqrt(alpha_bar_i), step rule per diffusion_mode.
    """
    import torch

    ref_model, _, _, _, ref_nn = import_reference()

    torch.manual_seed(0)
    model = ref_model.DiffusionModel(num_layers=2, c1=128, c2=192, c3=256).eval()
    text = torch.randint(1, 73, (1, 50))
    style = torch.randn(1, 14, 1280)
    beta_set = ref_nn.get_beta_set()
    alpha_set = torch.cumprod(1 - beta_set, dim=0)

    def run_line(grad_mode: bool) -> float:
        x = torch.randn(1, seq_len, 2)
        t0 = time.perf_counter()
        ctx = torch.enable_grad() if grad_mode else torch.no_grad()
        with ctx:
            for i in range(len(beta_set) - 1, -1, -1):
                alpha = alpha_set[i] * torch.ones((1, 1, 1))
                beta = beta_set[i] * torch.ones((1, 1, 1))
                a_next = alpha_set[i - 1] if i > 1 else torch.tensor(1.0)
                model_out, pen_lifts, _ = model(x, text, torch.sqrt(alpha), style)
                if mode == "standard":
                    x = ref_nn.standard_diffusion_step(
                        x, model_out, beta, alpha, add_sigma=bool(i)
                    )
                else:
                    x = ref_nn.new_diffusion_step(x, model_out, beta, alpha, a_next)
            out = torch.cat((x, pen_lifts.unsqueeze(2)), dim=2)
            np.asarray(out.detach())
        return time.perf_counter() - t0

    # Warm one short pass (allocator, GEMM planning).
    with torch.no_grad():
        model(torch.randn(1, seq_len, 2), text, torch.ones(1, 1), style)

    no_grad = [run_line(False) for _ in range(iters)]
    # As shipped: infer() has no torch.no_grad(), the 60-step graph is
    # recorded (inference.py:84-94). One iteration — it is strictly slower.
    as_shipped = [run_line(True)]
    return {
        "seq_len": seq_len,
        "n_steps": 60,
        "mode": mode,
        "line_s_no_grad": [round(s, 3) for s in no_grad],
        "line_s_no_grad_median": round(float(np.median(no_grad)), 3),
        "line_s_as_shipped": [round(s, 3) for s in as_shipped],
    }


def bench_train_step(iters: int = 3, batch: int = 96, seq_len: int = 480) -> dict:
    """Time the reference train step at its best-run batch size on CPU.

    The sequence is TrainingLoop.train_step (train.py:26-67): sample
    alpha-bars, perturb, forward, loss_fn, backward, clip, Noam-scheduled
    Adam step, 3x .item().
    """
    import torch

    ref_model, ref_loss, ref_sched, ref_clip, ref_nn = import_reference()

    torch.manual_seed(0)
    model = ref_model.DiffusionModel(num_layers=2, c1=128, c2=192, c3=256)
    model.train()
    optimizer = ref_sched.InvSqrtScheduledOptim(
        optimizer=torch.optim.Adam(
            model.parameters(), lr=3e-4, weight_decay=1e-5, betas=(0.9, 0.98)
        ),
        lr_mul=1.0,
        d_model=256,
        n_warmup_steps=10_000,
    )
    beta_set = ref_nn.get_beta_set()
    alpha_set = torch.cumprod(1 - beta_set, dim=0)

    x_data = torch.randn(batch, seq_len, 2)
    pen = (torch.rand(batch, seq_len) < 0.1).float()
    text = torch.randint(1, 73, (batch, 50))
    style = torch.randn(batch, 14, 1280)

    def step() -> tuple[float, float, float]:
        alphas = ref_nn.get_alphas(batch, alpha_set)
        eps = torch.randn_like(x_data)
        x_pert = (
            torch.sqrt(alphas).unsqueeze(-1) * x_data
            + torch.sqrt(1 - alphas).unsqueeze(-1) * eps
        )
        optimizer.zero_grad()
        strokes_pred, pen_pred, _ = model(x_pert, text, torch.sqrt(alphas), style)
        loss, score_loss, pen_loss = ref_loss.loss_fn(eps, strokes_pred, pen, pen_pred, alphas)
        loss.backward()
        ref_clip.dispatch_clip_grad(model.parameters(), value=100.0)
        optimizer.step_and_update_lr()
        return loss.item(), score_loss.item(), pen_loss.item()

    step()  # warm-up
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    return {
        "batch": batch,
        "seq_len": seq_len,
        "step_s": [round(s, 3) for s in times],
        "step_s_median": round(med, 3),
        "steps_per_sec": round(1.0 / med, 4),
    }


def main(sampler_iters: int = 2, train_iters: int = 3):
    import torch

    result = {
        "host_cpus": __import__("os").cpu_count(),
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "sampler": bench_sampler(iters=sampler_iters),
        "train": bench_train_step(iters=train_iters),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        if arg.startswith("--") and "=" in arg:
            k, v = arg[2:].split("=", 1)
            kw[k] = int(v)
    main(**kw)

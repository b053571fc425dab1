"""Cross-framework TRAINING-DYNAMICS parity: reference torch loop vs dhg.

The achievable stand-in for the blocked real-IAM run.log comparison
(data/best_exp/run.log): same tiny synthetic dataset, same transplanted
initialization, same per-step batch indices / alpha_bar draws / noise —
then N optimizer steps through

  * the REFERENCE pipeline: its DiffusionModel + loss_fn (loss.py:5-37) +
    dispatch_clip_grad (utils/clip_grad.py:27-49) + InvSqrtScheduledOptim
    over torch.optim.Adam (scheduler.py, train.py:26-67 semantics), and
  * the dhg pipeline: transplanted params + diffusion_loss + the optax
    chain built like dhg.train.make_optimizer (clip -> L2-into-grad ->
    Adam -> Noam -> -1).

Loss curves must track step-for-step: torch-Adam ordering, Noam n-offset,
clip placement, weight-decay placement, and BCE semantics all show up here
if wrong.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from test_reference_model_parity import _import_reference_model  # noqa: E402

N_DATA, BATCH, T_LEN, L_TOK = 32, 8, 96, 20
N_STEPS = 80
WARMUP = 200  # short warmup so the LR is non-negligible within N_STEPS
CLIP, WD, BETAS = 100.0, 1e-5, (0.9, 0.98)
D_MODEL = 256  # channels * 2 (train.py:150-155)


def _make_data(seed=0):
    rng = np.random.RandomState(seed)
    strokes = (rng.randn(N_DATA, T_LEN, 2) * 0.5).astype(np.float32)
    pen = (rng.rand(N_DATA, T_LEN) < 0.1).astype(np.float32)
    text = rng.randint(1, 73, size=(N_DATA, L_TOK)).astype(np.int64)
    text[:, 12:] = 0
    style = (rng.randn(N_DATA, 14, 1280) * 0.5).astype(np.float32)
    return strokes, pen, text, style


def _per_step_draws(alpha_set, seed=1):
    """Pre-draw every random quantity both frameworks consume per step."""
    rng = np.random.RandomState(seed)
    draws = []
    for _ in range(N_STEPS):
        idx = rng.randint(0, N_DATA, size=BATCH)
        lo = rng.randint(0, len(alpha_set) - 1, size=(BATCH, 1))
        u = rng.rand(BATCH, 1).astype(np.float32)
        alphas = (alpha_set[lo] + u * (alpha_set[lo + 1] - alpha_set[lo])).astype(np.float32)
        eps = rng.randn(BATCH, T_LEN, 2).astype(np.float32)
        draws.append((idx, alphas, eps))
    return draws


@pytest.mark.slow
def test_loss_curves_track_reference():
    TorchDM = _import_reference_model()
    import diffusion_handwriting_generation.loss as ref_loss
    import diffusion_handwriting_generation.scheduler as ref_sched
    import diffusion_handwriting_generation.utils.clip_grad as ref_clip

    from dhg.core.losses import diffusion_loss
    from dhg.core.schedule import get_alpha_set
    from dhg.models.denoiser import DiffusionModel
    from dhg.tools.convert_torch_checkpoint import convert_state_dict
    from dhg.train import noam_schedule

    strokes, pen, text, style = _make_data()
    alpha_set = np.asarray(get_alpha_set(), np.float32)
    draws = _per_step_draws(alpha_set)

    # ---- torch side: the reference train_step, verbatim semantics --------
    torch.manual_seed(0)
    tm = TorchDM(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.0).train()
    opt = ref_sched.InvSqrtScheduledOptim(
        torch.optim.Adam(tm.parameters(), lr=3e-4, weight_decay=WD, betas=BETAS),
        lr_mul=1.0,
        d_model=D_MODEL,
        n_warmup_steps=WARMUP,
    )
    t_losses = []
    for idx, alphas, eps in draws:
        x = torch.from_numpy(strokes[idx])
        p = torch.from_numpy(pen[idx])
        tx_ = torch.from_numpy(text[idx])
        st = torch.from_numpy(style[idx])
        a = torch.from_numpy(alphas)
        e = torch.from_numpy(eps)
        xt = torch.sqrt(a).unsqueeze(-1) * x + torch.sqrt(1 - a).unsqueeze(-1) * e

        opt.zero_grad()
        eps_pred, pen_pred, _ = tm(xt, tx_, torch.sqrt(a), st)
        loss, _, _ = ref_loss.loss_fn(e, eps_pred, p, pen_pred, a)
        loss.backward()
        ref_clip.dispatch_clip_grad(tm.parameters(), value=CLIP)
        opt.step_and_update_lr()
        t_losses.append(float(loss))

    # ---- dhg side: transplanted init, optax chain (dhg.train semantics) --
    # Transplant from a FRESH model with the same seed (tm has trained).
    torch.manual_seed(0)
    tm0 = TorchDM(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.0)
    params = jax.tree.map(
        jnp.asarray, convert_state_dict({k: v.numpy() for k, v in tm0.state_dict().items()})
    )

    jm = DiffusionModel(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.0)
    tx = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.add_decayed_weights(WD),
        optax.scale_by_adam(b1=BETAS[0], b2=BETAS[1], eps=1e-8),
        optax.scale_by_schedule(noam_schedule(D_MODEL, WARMUP)),
        optax.scale(-1.0),
    )
    opt_state = tx.init(params)

    @jax.jit
    def jstep(params, opt_state, xb, pb, tb, sb, alphas, eps):
        xt = jnp.sqrt(alphas)[..., None] * xb + jnp.sqrt(1 - alphas)[..., None] * eps

        def loss_fn(p):
            eps_pred, pen_pred = jm.apply({"params": p}, xt, tb, jnp.sqrt(alphas), sb)
            total, s, pl = diffusion_loss(eps, eps_pred, pb, pen_pred, alphas)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total

    j_losses = []
    for idx, alphas, eps in draws:
        params, opt_state, total = jstep(
            params,
            opt_state,
            jnp.asarray(strokes[idx]),
            jnp.asarray(pen[idx]),
            jnp.asarray(text[idx].astype(np.int32)),
            jnp.asarray(style[idx]),
            jnp.asarray(alphas),
            jnp.asarray(eps),
        )
        j_losses.append(float(total))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(t_arr - j_arr) / np.abs(t_arr)

    # Early steps: numerically tight (same math, f32 drift only).
    assert np.all(rel[:10] < 5e-3), rel[:10]
    # Whole curve tracks within a small mean relative gap...
    assert float(rel.mean()) < 0.02, (rel.mean(), rel.max())
    # ...and both frameworks actually LEARN the same amount.
    t_drop = t_arr[:5].mean() - t_arr[-5:].mean()
    j_drop = j_arr[:5].mean() - j_arr[-5:].mean()
    assert t_drop > 0 and j_drop > 0
    assert abs(t_drop - j_drop) / t_drop < 0.05, (t_drop, j_drop)

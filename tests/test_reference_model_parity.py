"""END-TO-END numerical parity vs the ACTUAL reference torch model.

This is the BASELINE acceptance bar (stroke outputs within 1e-3 MSE of the
PyTorch reference): we import `/root/reference`'s real
`diffusion_handwriting_generation.model.DiffusionModel`, transplant its
`state_dict()` through the production converter
(dhg/tools/convert_torch_checkpoint.py::convert_state_dict), and assert

  (a) f32 forward parity on several (T, text, sigma, style) cases vs the
      reference forward (model.py:121-182), and
  (b) full 60-step sampler parity — both diffusion modes — feeding both
      sides the SAME pre-drawn noise sequence, vs the reference loop
      (inference.py:84-94) calling the reference step rules
      (utils/nn.py:64-112) verbatim.

This de-circularizes tests/test_torch_checkpoint_convert.py: the converter
is exercised against names/shapes produced by the reference's own code, not
by a test-built replica.

The only reference import blocker is `from torchvision import models` in
text_style.py:4 (torchvision is absent here); DiffusionModel never
instantiates StyleExtractor, so a module stub suffices.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _import_reference_model():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from diffusion_handwriting_generation.model import DiffusionModel as TorchDM

    return TorchDM


@pytest.fixture(scope="module")
def pair():
    """(torch reference model in eval mode, transplanted dhg params, dhg model)."""
    TorchDM = _import_reference_model()
    torch.manual_seed(1234)
    # The reference channel plan is effectively pinned: AffineTransformLayer
    # hard-codes Linear(32, ...) (conditioning.py:9) and sigma_ffn emits
    # c1 // 4 dims (model.py:83), so c1 must be 128.
    tm = TorchDM(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.1).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from dhg.tools.convert_torch_checkpoint import convert_state_dict

    params = jax.tree.map(jnp.asarray, convert_state_dict(sd))

    from dhg.models.denoiser import DiffusionModel

    jm = DiffusionModel(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.1)
    return tm, params, jm


def _case(seed, b, t, l, sigma_val=None, pad_from=None):
    rng = np.random.RandomState(seed)
    strokes = rng.randn(b, t, 2).astype(np.float32)
    text = rng.randint(1, 73, size=(b, l)).astype(np.int64)
    if pad_from is not None:
        text[:, pad_from:] = 0  # exercise the padding-mask path
    if sigma_val is None:
        sigma = rng.rand(b, 1).astype(np.float32)
    else:
        sigma = np.full((b, 1), sigma_val, np.float32)
    style = rng.randn(b, 14, 1280).astype(np.float32)
    return strokes, text, sigma, style


@pytest.mark.parametrize(
    "seed,b,t,l,sigma_val,pad_from",
    [
        (0, 2, 96, 12, None, None),
        (1, 1, 400, 50, None, 24),  # config-shaped, padded text
        (2, 2, 64, 8, 0.999, None),  # sigma ~ 1 (low noise end)
        (3, 2, 64, 8, 0.02, None),  # sigma ~ 0 (high noise end)
    ],
)
def test_forward_parity(pair, seed, b, t, l, sigma_val, pad_from):
    """dhg forward == reference forward under transplanted weights (<=1e-4)."""
    tm, params, jm = pair
    strokes, text, sigma, style = _case(seed, b, t, l, sigma_val, pad_from)

    with torch.no_grad():
        eps_t, pen_t, _ = tm(
            torch.from_numpy(strokes),
            torch.from_numpy(text),
            torch.from_numpy(sigma),
            torch.from_numpy(style),
        )
    eps_j, pen_j = jm.apply(
        {"params": params},
        jnp.asarray(strokes),
        jnp.asarray(text.astype(np.int32)),
        jnp.asarray(sigma),
        jnp.asarray(style),
    )

    np.testing.assert_allclose(np.asarray(eps_j), eps_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pen_j), pen_t.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["new", "standard"])
def test_sampler_parity_60_steps(pair, mode, monkeypatch):
    """Full 60-step reverse diffusion: dhg's lax.scan sampler vs the
    reference Python loop (inference.py:84-94), identical noise both sides.

    The dhg sampler draws x0 and per-step noise from deterministic key
    splits; we replay exactly those draws into the reference loop by
    patching torch.randn_like (the only noise source inside the reference
    step rules, utils/nn.py:86,111).
    """
    tm, params, jm = pair
    import diffusion_handwriting_generation.utils.nn as ref_nn

    from dhg.core.sampling import diffusion_sample
    from dhg.core.schedule import get_beta_set

    b, t, l = 1, 96, 6
    rng = np.random.RandomState(7 if mode == "new" else 8)
    text = rng.randint(1, 73, size=(b, l)).astype(np.int64)
    style = rng.randn(b, 14, 1280).astype(np.float32)

    # ---- dhg side: ONE jitted scan --------------------------------------
    key = jax.random.PRNGKey(42)

    def denoise_fn(x, sigma):
        return jm.apply(
            {"params": params},
            x,
            jnp.asarray(text.astype(np.int32)),
            sigma,
            jnp.asarray(style),
        )

    out_j = np.asarray(
        jax.jit(
            lambda k: diffusion_sample(denoise_fn, k, batch_size=b, seq_len=t, mode=mode)
        )(key)
    )

    # ---- replay the dhg key splits to recover the exact noise sequence --
    k_init, k_steps = jax.random.split(key)
    x0 = np.asarray(jax.random.normal(k_init, (b, t, 2), jnp.float32))
    step_keys = jax.random.split(k_steps, 60)
    noises = [np.asarray(jax.random.normal(k, (b, t, 2), jnp.float32)) for k in step_keys]

    # ---- reference side: the inference.py:84-94 loop, verbatim rules ----
    noise_iter = iter(noises)

    def fake_randn_like(x):
        n = next(noise_iter)
        assert n.shape == tuple(x.shape)
        return torch.from_numpy(n)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)

    beta_set = torch.from_numpy(np.asarray(get_beta_set(), np.float32))
    alpha_set = torch.cumprod(1 - beta_set, dim=0)
    x = torch.from_numpy(x0)
    text_t = torch.from_numpy(text)
    style_t = torch.from_numpy(style)
    with torch.no_grad():
        for step, i in enumerate(range(len(beta_set) - 1, -1, -1)):
            alpha = alpha_set[i] * torch.ones((b, 1, 1))
            beta = beta_set[i] * torch.ones((b, 1, 1))
            a_next = alpha_set[i - 1] if i > 1 else torch.tensor(1.0)
            eps, pen_lifts, _ = tm(x, text_t, torch.sqrt(alpha), style_t)
            if mode == "standard":
                # standard mode skips the noise at i == 0 (inference.py:92);
                # the dhg scan draws it but gates it to zero — consume the
                # replayed draw to keep the streams aligned.
                if not bool(i):
                    next(noise_iter)
                x = ref_nn.standard_diffusion_step(x, eps, beta, alpha, add_sigma=bool(i))
            else:
                x = ref_nn.new_diffusion_step(x, eps, beta, alpha, a_next)
    out_t = torch.cat((x, pen_lifts.unsqueeze(2)), dim=2).numpy()

    mse = float(np.mean((out_j - out_t) ** 2))
    assert mse <= 1e-3, f"sampler MSE vs reference = {mse}"
    # In practice f32 parity is far tighter than the acceptance bar:
    np.testing.assert_allclose(out_j, out_t, rtol=1e-3, atol=2e-4)

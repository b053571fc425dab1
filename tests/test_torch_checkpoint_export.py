"""dhg -> torch checkpoint export (inverse of the torch -> dhg converter).

Non-circular: the exported state_dict is loaded into the ACTUAL reference
DiffusionModel (/root/reference, model.py:61-119) with strict key checking
— its own module tree defines the expected names — and the torch forward
must match the dhg forward under the exported weights (<=1e-4, the same
bar as tests/test_reference_model_parity.py).
"""

import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _import_reference_model():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from diffusion_handwriting_generation.model import DiffusionModel as TorchDM

    return TorchDM


@pytest.fixture(scope="module")
def dhg_params():
    from dhg.models.denoiser import DiffusionModel

    jm = DiffusionModel(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.1)
    params = jm.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 64, 2)),
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 1)),
        jnp.zeros((1, 14, 1280)),
    )["params"]
    return jm, params


def test_round_trip_is_exact(dhg_params):
    """export -> convert reproduces the original tree bit-exactly."""
    from dhg.tools.convert_torch_checkpoint import convert_state_dict
    from dhg.tools.export_torch_checkpoint import export_state_dict

    _, params = dhg_params
    back = convert_state_dict(export_state_dict(params))

    flat_orig = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_back = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_orig] == [p for p, _ in flat_back]
    for (path, a), (_, b) in zip(flat_orig, flat_back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


def test_reference_model_loads_export_strict_and_matches_forward(dhg_params):
    """The real reference model accepts the export (strict) and agrees."""
    from dhg.tools.export_torch_checkpoint import export_state_dict

    jm, params = dhg_params
    TorchDM = _import_reference_model()
    tm = TorchDM(num_layers=2, c1=128, c2=192, c3=256, drop_rate=0.1).eval()

    sd = OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in export_state_dict(params).items()
    )
    # strict=True raises on any missing/unexpected key; reaching past this
    # line means every reference parameter was covered by the export.
    tm.load_state_dict(sd, strict=True)

    rng = np.random.RandomState(11)
    strokes = rng.randn(2, 64, 2).astype(np.float32)
    text = rng.randint(1, 73, size=(2, 8)).astype(np.int64)
    text[:, 6:] = 0  # exercise the padding mask
    sigma = rng.rand(2, 1).astype(np.float32)
    style = rng.randn(2, 14, 1280).astype(np.float32)

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


def test_cli_exports_pth_preferring_ema(dhg_params, tmp_path, monkeypatch):
    """End-to-end CLI: orbax checkpoint dir -> reference-shaped .pth.

    The checkpoint carries a distinct EMA shadow; the CLI must prefer it
    (like dhg load_model) and record that in meta.
    """
    from dhg.checkpoint import save_checkpoint
    from dhg.tools import export_torch_checkpoint as cli

    _, params = dhg_params
    ema = jax.tree.map(lambda x: x + 1.0, params)
    exp = tmp_path / "run"
    save_checkpoint(exp / "model_final", params, ema_params=ema, step=7)

    dst = tmp_path / "exported.pth"
    monkeypatch.setattr(
        sys,
        "argv",
        ["export", f"--experiment_path={exp}", f"--dst={dst}"],
    )
    cli.main()

    ckpt = torch.load(dst, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"meta", "state_dict"}
    assert ckpt["meta"]["ema"] is True
    assert ckpt["meta"]["step"] == 7
    # EMA (params + 1) was exported, not the raw params:
    got = ckpt["state_dict"]["input_dense.weight"].numpy()
    want = np.asarray(ema["input_dense"]["kernel"], np.float32).T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # And the reference container round-trips through the dhg converter too.
    from dhg.tools.convert_torch_checkpoint import convert_state_dict

    back = convert_state_dict({k: v.numpy() for k, v in ckpt["state_dict"].items()})
    np.testing.assert_array_equal(
        np.asarray(back["output_dense"]["kernel"]),
        np.asarray(ema["output_dense"]["kernel"], np.float32),
    )

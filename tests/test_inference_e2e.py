"""End-to-end: tiny train run -> checkpoint -> infer() -> PNG on disk."""

import os

import numpy as np
import pytest

import jax

from dhg.config import DLConfig, fit_config


@pytest.fixture(scope="module")
def tiny_experiment(tmp_path_factory):
    """Run a 12-step synthetic training and save model_final + config.yml."""
    from dhg.checkpoint import save_checkpoint
    from dhg.train import Trainer

    exp_dir = tmp_path_factory.mktemp("exp")
    cfg = DLConfig(
        fit_config(
            config="smoke.yml",
            **{
                "training_args.steps": 12,
                "training_args.channels": 32,
                "training_args.att_layers_num": 1,
                "training_args.batch_size": 4,
                "training_args.max_files": 8,
                "training_args.compute_dtype": "float32",
                "dataset_args.max_seq_len": 96,
                "dataset_args.max_text_len": 20,
            },
        )
    )
    t = Trainer(cfg)
    data = t.load_dataset()
    state = t.init_state(0)
    step = t.make_step_fn(data)
    for i in range(12):
        state, _ = step(state, jax.random.fold_in(jax.random.PRNGKey(0), i))
    save_checkpoint(exp_dir / "model_final", state.params)
    cfg.dump(exp_dir / "config.yml")
    return exp_dir


def test_generate_from_checkpoint(tiny_experiment):
    from dhg.checkpoint import load_model, resolve_checkpoint
    from dhg.inference import generate
    import jax.numpy as jnp

    ckpt = resolve_checkpoint(tiny_experiment)
    assert ckpt is not None and ckpt.name == "model_final"
    model, params = load_model(tiny_experiment / "config.yml", ckpt)

    text = jnp.zeros((2, 20), jnp.int32).at[:, :5].set(3).at[:, 5].set(1)
    style = jnp.zeros((2, 14, 1280))
    out = generate(model, params, text, style, jax.random.PRNGKey(0), seq_len=96)
    assert out.shape == (2, 96, 3)
    arr = np.asarray(out)
    assert np.all(np.isfinite(arr))
    assert arr[..., 2].min() >= 0.0 and arr[..., 2].max() <= 1.0


def test_infer_cli_produces_png(tiny_experiment, tmp_path, monkeypatch):
    """Full infer() path with a synthetic style image written to disk."""
    import cv2

    from dhg.inference import infer

    # Synthetic "handwriting" style image: dark scribble on white.
    img = np.full((96, 400), 255, np.uint8)
    rng = np.random.RandomState(0)
    xs = np.linspace(10, 390, 300).astype(int)
    ys = (48 + 30 * np.sin(xs / 15.0) + rng.randn(300) * 2).astype(int).clip(5, 90)
    img[ys, xs] = 0
    src = tmp_path / "style.png"
    cv2.imwrite(str(src), img)

    monkeypatch.chdir(tmp_path)  # show_strokes writes ./<output>.png
    out = infer(
        prompt="abc",
        source=str(src),
        experiment_path=str(tiny_experiment),
        output="result_test",
        seed=1,
    )
    assert (tmp_path / "result_test.png").exists()
    assert out.shape[1] == 3
    # T = 16 * 4 tokens -> 64 -> bumped to 72.
    assert out.shape[0] == 72


def test_infer_prompts_file_batched(tiny_experiment, tmp_path, monkeypatch):
    """--prompts_file renders every line from ONE padded batch, trimmed to
    each prompt's own 16*len heuristic length (BASELINE config 2 through
    the CLI surface)."""
    import cv2

    from dhg.inference import infer, infer_seq_len

    img = np.full((96, 400), 255, np.uint8)
    xs = np.linspace(10, 390, 300).astype(int)
    ys = (48 + 30 * np.sin(xs / 15.0)).astype(int).clip(5, 90)
    img[ys, xs] = 0
    src = tmp_path / "style.png"
    cv2.imwrite(str(src), img)

    pf = tmp_path / "prompts.txt"
    pf.write_text("ab\nhello\n\n")  # trailing blank line ignored

    monkeypatch.chdir(tmp_path)
    outs = infer(
        prompts_file=str(pf),
        source=str(src),
        experiment_path=str(tiny_experiment),
        output="batch",
        seed=3,
    )
    assert len(outs) == 2
    assert (tmp_path / "batch_000.png").exists()
    assert (tmp_path / "batch_001.png").exists()
    assert outs[0].shape == (infer_seq_len(3), 3)  # "ab" + EOS
    assert outs[1].shape == (infer_seq_len(6), 3)  # "hello" + EOS
    assert all(np.all(np.isfinite(o)) for o in outs)


def test_infer_style_mix(tiny_experiment, tmp_path, monkeypatch):
    """--source2/--style_mix blends two style vectors: mix=0 reproduces
    source, mix=1 reproduces source2, and the 0.5 default differs from
    both (superset of the reference's single-style conditioning)."""
    import cv2

    from dhg.inference import infer

    def style_img(path, freq):
        img = np.full((96, 400), 255, np.uint8)
        xs = np.linspace(10, 390, 300).astype(int)
        ys = (48 + 30 * np.sin(xs / freq)).astype(int).clip(5, 90)
        img[ys, xs] = 0
        cv2.imwrite(str(path), img)
        return str(path)

    src_a = style_img(tmp_path / "a.png", 15.0)
    src_b = style_img(tmp_path / "b.png", 7.0)

    monkeypatch.chdir(tmp_path)
    common = dict(
        prompt="ab", experiment_path=str(tiny_experiment), seed=5, output="mix"
    )
    out_a = infer(source=src_a, **common)
    out_b = infer(source=src_b, **common)
    out_mix0 = infer(source=src_a, source2=src_b, style_mix=0.0, **common)
    out_mix1 = infer(source=src_a, source2=src_b, style_mix=1.0, **common)
    out_half = infer(source=src_a, source2=src_b, **common)  # default 0.5

    np.testing.assert_allclose(out_mix0, out_a, atol=1e-5)
    np.testing.assert_allclose(out_mix1, out_b, atol=1e-5)
    assert not np.allclose(out_half, out_a, atol=1e-5)
    assert not np.allclose(out_half, out_b, atol=1e-5)
    assert np.all(np.isfinite(out_half))

    with pytest.raises(ValueError, match="style_mix requires source2"):
        infer(source=src_a, style_mix=0.5, **common)


def test_infer_wrap_paragraph(tiny_experiment, tmp_path, monkeypatch):
    """--wrap samples a word-wrapped paragraph in ONE padded batch and
    composes a single multi-line page (capability superset: the reference
    renders exactly one line)."""
    import cv2

    from dhg.inference import infer, wrap_text
    from dhg.utils.vis import drawn_segments

    img = np.full((96, 400), 255, np.uint8)
    xs = np.linspace(10, 390, 300).astype(int)
    ys = (48 + 30 * np.sin(xs / 15.0)).astype(int).clip(5, 90)
    img[ys, xs] = 0
    src = tmp_path / "style.png"
    cv2.imwrite(str(src), img)

    prompt = "ab cd ef"
    monkeypatch.chdir(tmp_path)
    page = infer(
        prompt=prompt,
        source=str(src),
        experiment_path=str(tiny_experiment),
        output="page",
        seed=7,
        wrap=5,
        line_gap=5000.0,
    )
    assert wrap_text(prompt, 5) == ["ab cd", "ef"]
    assert (tmp_path / "page.png").exists()
    assert page.ndim == 2 and page.shape[1] == 3
    assert np.all(np.isfinite(page))
    # The two wrapped lines must land in DISTINCT vertical bands: with an
    # explicit line_gap of 5000 stroke units (far above any single line's
    # ink height from this tiny model) the drawn y-coordinates of the page
    # separate into two clusters with a wide gap between them.
    xy, draw = drawn_segments(page)
    assert draw.any(), "page drew no ink"
    ys_drawn = np.sort(
        np.unique(np.concatenate([xy[:-1][draw][:, 1], xy[1:][draw][:, 1]]))
    )
    assert ys_drawn.size >= 2, "page ink collapsed to a single point"
    largest_band_gap = float(np.diff(ys_drawn).max())
    assert largest_band_gap > 2500.0, (
        f"expected two vertical ink bands separated by the 5000-unit "
        f"line_gap; largest gap in drawn y-coords was {largest_band_gap:.1f}"
    )

    # wrap width must leave room for EOS within max_text_len (20 here).
    with pytest.raises(ValueError, match="max_text_len"):
        infer(
            prompt=prompt,
            source=str(src),
            experiment_path=str(tiny_experiment),
            wrap=25,
        )
    # wrap is a single-prompt feature.
    pf = tmp_path / "p.txt"
    pf.write_text("x\n")
    with pytest.raises(ValueError, match="not prompts_file"):
        infer(
            prompts_file=str(pf),
            source=str(src),
            experiment_path=str(tiny_experiment),
            wrap=5,
        )


def test_infer_prompt_xor_prompts_file(tiny_experiment, tmp_path):
    from dhg.inference import infer

    with pytest.raises(ValueError, match="exactly one"):
        infer(
            prompt="x",
            prompts_file=str(tmp_path / "p.txt"),
            source="img.png",
            experiment_path=str(tiny_experiment),
        )
    with pytest.raises(ValueError, match="exactly one"):
        infer(source="img.png", experiment_path=str(tiny_experiment))

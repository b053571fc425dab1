"""Generation-quality metrics — a capability superset of the reference.

The reference ships NO quality evaluation: its only quantitative record is
the train-loss window in `data/best_exp/run.log`, and its renderer
(`utils/vis.py:5-36`) goes through matplotlib+PNG, which is unusable for
scoring thousands of generated lines. This module adds three layers:

1. `rasterize_strokes` — a fast pure-numpy stroke rasterizer with the SAME
   pen semantics as `dhg.utils.vis.show_strokes` (reference utils/vis.py:
   5-36: cumsum deltas; a rounded pen==1 at index i means the segment
   arriving at i was pen-up, so that segment is not drawn; nothing after
   the last pen-up point is drawn), producing a grayscale [H, W] page
   (white 255 / ink 0, like IAM line crops) with no matplotlib and no file
   round-trip.
2. `stroke_stats` / `compare_stroke_sets` — distributional statistics of
   (dx, dy, pen) sequences and two-sample Kolmogorov-Smirnov distances
   between a generated set and a reference set.
3. `frechet_style_distance` — an FID-style Fréchet distance over
   StyleExtractor features of the rasterized lines (the in-repo analogue
   of FID's Inception embedding; with converted torchvision weights —
   dhg/tools/convert_torchvision_mnv2.py — it becomes a true
   pretrained-feature FID for handwriting).

CLI:
    python -m dhg.metrics --experiment_path=<run dir> [--split=validation]
                          [--n_samples=64] [--batch_size=32] [--seed=0]
                          [--n_steps=...] [--diffusion_mode=new]
                          [--schedule=strided|halved]

samples lines conditioned on the split's real texts/styles and scores them
against the split's real strokes, printing one JSON dict. Distilled
students (config training_args.distilled_steps) default to their own
halved-grid DDIM sampler exactly like `dhg.inference.infer` — explicit
flags always win.
"""

from __future__ import annotations

import numpy as np

from dhg.utils.vis import drawn_segments  # canonical pen-semantics helper

# ---------------------------------------------------------------------------
# 1. Rasterizer
# ---------------------------------------------------------------------------


def rasterize_strokes(
    strokes: np.ndarray,
    height: int = 96,
    thickness: float = 1.2,
    pad: int = 4,
    max_width: int = 1400,
    width: int | None = None,
) -> np.ndarray:
    """Render a [T, 3] (dx, dy, pen) sequence to a grayscale [height, W] page.

    The ink geometry matches show_strokes (same drawn segments, y-up
    flipped to image rows); scale preserves aspect ratio with the glyph
    body fit to `height - 2*pad` rows. `width=None` sizes the page to the
    line (clipped to max_width); pass a fixed width for stackable batches
    (right-padded with white, like the dataset's pad_img).
    """
    xy, draw = drawn_segments(strokes)
    if not draw.any():
        return np.full((height, width or height), 255.0, np.float32)

    p0, p1 = xy[:-1][draw], xy[1:][draw]
    pts = np.concatenate([p0, p1], axis=0)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    scale = (height - 2 * pad) / max(hi[1] - lo[1], 1e-6)
    natural = int(np.ceil((hi[0] - lo[0]) * scale)) + 2 * pad
    w = min(natural, max_width) if width is None else width
    if natural > w:  # fixed/clipped width: shrink to fit
        scale *= (w - 2 * pad) / max((hi[0] - lo[0]) * scale, 1e-6)

    to_px = lambda q: np.stack(
        [
            pad + (q[:, 0] - lo[0]) * scale,
            (height - 1 - pad) - (q[:, 1] - lo[1]) * scale,  # y-up -> row
        ],
        axis=1,
    )
    a, b = to_px(p0), to_px(p1)

    # Densify every segment to ~1 point per pixel of length (vectorized).
    seg_len = np.hypot(*(b - a).T)
    n = np.ceil(seg_len).astype(int) + 1
    total = int(n.sum())
    seg_idx = np.repeat(np.arange(len(n)), n)
    within = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
    frac = within / np.maximum(np.repeat(n - 1, n), 1)
    dense = a[seg_idx] + frac[:, None] * (b - a)[seg_idx]

    img = np.full((height, w), 255.0, np.float32)
    r = max(int(np.ceil(thickness)), 1)
    ox, oy = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    disk = (ox**2 + oy**2) <= thickness**2 + 0.25
    cx = np.round(dense[:, 0]).astype(int)
    cy = np.round(dense[:, 1]).astype(int)
    for dx, dy in zip(ox[disk], oy[disk]):
        px = np.clip(cx + dx, 0, w - 1)
        py = np.clip(cy + dy, 0, height - 1)
        img[py, px] = 0.0
    return img


# ---------------------------------------------------------------------------
# 2. Distributional stroke statistics
# ---------------------------------------------------------------------------


def _active_prefix(seq: np.ndarray) -> np.ndarray:
    """The sequence up to (and including) its last pen-up point.

    Both real cache rows (padded with (0, 0, 1) rows — utils/
    preprocessing.py:20-26) and generated rows are compared over the same
    region show_strokes would render."""
    pen_up = np.flatnonzero(np.asarray(seq)[:, 2].round() == 1)
    if pen_up.size == 0:
        return np.asarray(seq)
    return np.asarray(seq)[: pen_up[-1] + 1]


def stroke_stats(strokes: np.ndarray | list) -> dict[str, np.ndarray]:
    """Per-line scalar statistics over a set of [T, 3] sequences.

    Returns {stat_name: [N] float array}. Stats are computed over each
    line's active prefix (up to the last pen-up point) so real padded rows
    and generated rows are comparable.
    """
    per_line: dict[str, list[float]] = {
        "dx_mean": [], "dx_std": [], "dy_mean": [], "dy_std": [],
        "pen_lift_rate": [], "mean_pen_run": [], "path_len": [],
        "active_len": [], "net_advance": [],
    }
    for seq in strokes:
        s = _active_prefix(seq)
        d = s[:, :2].astype(float)
        pen = s[:, 2].round()
        per_line["dx_mean"].append(d[:, 0].mean())
        per_line["dx_std"].append(d[:, 0].std())
        per_line["dy_mean"].append(d[:, 1].mean())
        per_line["dy_std"].append(d[:, 1].std())
        per_line["pen_lift_rate"].append(pen.mean())
        runs = np.diff(np.flatnonzero(np.concatenate([[1.0], pen])))
        per_line["mean_pen_run"].append(float(runs.mean()) if runs.size else 0.0)
        per_line["path_len"].append(float(np.hypot(d[:, 0], d[:, 1]).sum()))
        per_line["active_len"].append(float(len(s)))
        per_line["net_advance"].append(float(d[:, 0].sum()))
    return {k: np.asarray(v, float) for k, v in per_line.items()}


def ks_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic (sup |F_a - F_b|)."""
    a = np.sort(np.asarray(a, float).ravel())
    b = np.sort(np.asarray(b, float).ravel())
    if a.size == 0 or b.size == 0:
        return 1.0
    grid = np.concatenate([a, b])
    fa = np.searchsorted(a, grid, side="right") / a.size
    fb = np.searchsorted(b, grid, side="right") / b.size
    return float(np.abs(fa - fb).max())


def compare_stroke_sets(generated, reference) -> dict:
    """Per-stat KS distances between two sets of stroke sequences.

    0 = identical distributions, 1 = disjoint. `ks_mean` summarizes."""
    ga, rb = stroke_stats(generated), stroke_stats(reference)
    ks = {k: round(ks_distance(ga[k], rb[k]), 4) for k in ga}
    ks["ks_mean"] = round(float(np.mean(list(ks.values()))), 4)
    return ks


# ---------------------------------------------------------------------------
# 3. Fréchet style distance
# ---------------------------------------------------------------------------


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """Fréchet distance between two Gaussians (the FID formula).

    tr sqrt(cov1 @ cov2) is computed from the eigenvalues of the product
    (real and non-negative for PSD factors, up to roundoff — negatives are
    clipped), avoiding a scipy.linalg.sqrtm dependency.
    """
    diff = float(((mu1 - mu2) ** 2).sum())
    ev = np.linalg.eigvals(cov1 @ cov2)
    tr_sqrt = float(np.sqrt(np.clip(ev.real, 0.0, None)).sum())
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * tr_sqrt


def style_features(
    images: np.ndarray, feature_fn=None, batch_size: int = 32
) -> np.ndarray:
    """[N, H, W] grayscale pages -> [N, 1280] embedding.

    Default embedding: the frozen StyleExtractor's [14, 1280] output,
    mean-pooled over the 14 horizontal bins. A random-init trunk still
    yields a usable texture descriptor (measured: PERFORMANCE.md,
    "Random-trunk style gap"); converted torchvision weights upgrade this
    to pretrained features with no code change.
    """
    if feature_fn is None:
        import warnings

        from dhg.models.style_extractor import init_style_extractor

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # random-init warning: known here
            _, _, apply_fn = init_style_extractor()
        feature_fn = lambda x: np.asarray(apply_fn(x)).mean(axis=1)
    feats = [
        np.asarray(feature_fn(images[i : i + batch_size]))
        for i in range(0, len(images), batch_size)
    ]
    return np.concatenate(feats, axis=0)


def frechet_style_distance(
    generated,
    reference,
    feature_fn=None,
    height: int = 96,
    width: int = 512,
    batch_size: int = 32,
) -> float:
    """FID-style score between two sets of [T, 3] stroke sequences.

    Both sets are rasterized to fixed [height, width] pages, embedded with
    `style_features`, and compared with the Fréchet (FID) formula. Lower
    is better; 0 means matching feature moments.
    """
    pages = lambda seqs: np.stack(
        [rasterize_strokes(s, height=height, width=width) for s in seqs]
    )
    fg = style_features(pages(generated), feature_fn, batch_size)
    fr = style_features(pages(reference), feature_fn, batch_size)
    mu_g, mu_r = fg.mean(axis=0), fr.mean(axis=0)
    cov_g = np.cov(fg, rowvar=False).reshape(fg.shape[1], fg.shape[1])
    cov_r = np.cov(fr, rowvar=False).reshape(fr.shape[1], fr.shape[1])
    return frechet_distance(mu_g, cov_g, mu_r, cov_r)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def evaluate_generation(
    experiment_path: str,
    split: str = "validation",
    n_samples: int = 64,
    batch_size: int = 32,
    seed: int = 0,
    diffusion_mode: str | None = None,
    n_steps: int | None = None,
    schedule: str | None = None,
    use_ema: bool = True,
    fsd: bool = True,
) -> dict:
    """Sample lines for a split's texts/styles and score them vs its strokes.

    Conditioning (text, style) comes from the split's REAL rows, so the
    model is scored on the same prompts the reference set realizes; the
    comparison is generated-vs-real strokes for identical conditions.
    """
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from dhg.checkpoint import load_model, resolve_checkpoint
    from dhg.config import DLConfig
    from dhg.inference import generate
    from dhg.train import load_cache

    exp = Path(experiment_path)
    model, params = load_model(
        str(exp / "config.yml"), str(resolve_checkpoint(exp)), use_ema=use_ema
    )
    cfg = DLConfig.load(str(exp / "config.yml"))
    # Distilled-student defaults, mirroring dhg.inference.infer:582-596
    # (explicit flags always win): score the student on the sampler it was
    # trained for — its own halved grid, deterministic DDIM.
    distilled = cfg.training_args.distilled_steps
    if distilled:
        if n_steps is None:
            n_steps = int(distilled)
        if schedule is None:
            schedule = "halved"
        if diffusion_mode is None:
            diffusion_mode = "ddim"
    if diffusion_mode is None:
        diffusion_mode = "new"  # the reference default
    if schedule is None:
        schedule = "strided"
    cache = load_cache(cfg, split)
    if cache is None or len(cache) == 0:
        raise RuntimeError(f"no samples in the {split!r} split")

    n = min(n_samples, len(cache))
    real = np.asarray(cache.strokes[:n])
    gen_rows = []
    key = jax.random.PRNGKey(seed)
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        out = generate(
            model,
            params,
            jnp.asarray(cache.text[sl]),
            jnp.asarray(cache.style[sl]),
            jax.random.fold_in(key, i),
            seq_len=real.shape[1],
            diffusion_mode=diffusion_mode,
            n_steps=n_steps,
            schedule=schedule,
        )
        gen_rows.append(np.asarray(out))
    gen = np.concatenate(gen_rows, axis=0)

    result: dict = {
        "split": split,
        "n": int(n),
        "sampler": {
            "diffusion_mode": diffusion_mode,
            "n_steps": n_steps or 60,
            "schedule": schedule,
        },
        "ks": compare_stroke_sets(gen, real),
    }
    if fsd:
        # Embed with the SAME trunk the run trained against
        # (dataset_args.style_weights — e.g. the in-env writer-
        # discriminative trunk, dhg/tools/train_style_trunk.py); falls back
        # to the repo default inside style_features when unset.
        feature_fn = None
        sw = cfg.dataset_args.style_weights
        if sw:
            import warnings

            from dhg.models.style_extractor import init_style_extractor

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                _, _, apply_fn = init_style_extractor(weights_path=sw)
            feature_fn = lambda x: np.asarray(apply_fn(x)).mean(axis=1)
            result["fsd_trunk"] = str(sw)
        result["frechet_style_distance"] = round(
            frechet_style_distance(gen, real, feature_fn), 4
        )
        # Calibration: FSD between two halves of the REAL set — the noise
        # floor the generated score should be read against at this n.
        half = n // 2
        if half >= 2:
            result["fsd_real_vs_real"] = round(
                frechet_style_distance(real[:half], real[half : 2 * half], feature_fn), 4
            )
    return result


def main(argv=None) -> None:
    import json
    import sys

    from dhg.config import parse_cli_kwargs

    kwargs = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    print(json.dumps(evaluate_generation(**kwargs)))


if __name__ == "__main__":
    main()

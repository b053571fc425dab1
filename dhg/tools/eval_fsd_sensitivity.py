"""Sensitivity check of the Fréchet style distance (round-4 verdict #8).

Round 3 flagged that FSD rides the style trunk, and with a random-init
trunk (writer features nearly parallel) its discriminative power was
doubtful — but no sensitivity check of the metric itself existed. This
tool runs one: corrupt a held-out set of real stroke sequences with
increasing noise and verify FSD(corrupted, reference) is MONOTONE in the
corruption strength, for both the random-init trunk and the trained
writer-discriminative trunk (data/style_trunk_synth.npz).

Corruption model (per level c):
  * Gaussian noise of std c added to the (dx, dy) deltas of real rows
    (active rows only — padding stays padding);
  * pen bits flipped with probability c / 5.

Run:  python -m dhg.tools.eval_fsd_sensitivity --cache=<packed .npz>
          [--weights=data/style_trunk_synth.npz] [--n=48]
Prints one JSON dict {trunk: {level: fsd}}; monotone rows mean the metric
orders corruption correctly. Results in PERFORMANCE.md ("FSD sensitivity").
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

LEVELS = (0.0, 0.1, 0.25, 0.5, 1.0)


def corrupt(rows: np.ndarray, c: float, seed: int = 0) -> np.ndarray:
    """Noise the deltas and flip pen bits of [N, T, 3] rows at strength c."""
    rng = np.random.RandomState(int(seed + c * 1000))
    out = rows.copy()
    active = ~((rows[..., 0] == 0) & (rows[..., 1] == 0) & (rows[..., 2] == 1))
    noise = rng.randn(*rows.shape[:2], 2).astype(np.float32) * c
    out[..., :2] += noise * active[..., None]
    flips = (rng.rand(*rows.shape[:2]) < c / 5.0) & active
    out[..., 2] = np.where(flips, 1.0 - np.round(out[..., 2]), out[..., 2])
    return out


def feature_fn_for(weights: str | None):
    import warnings

    from dhg.models.style_extractor import init_style_extractor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, _, apply_fn = init_style_extractor(weights_path=weights)
    return lambda x: np.asarray(apply_fn(x)).mean(axis=1)


def run(cache_path: str, weights: str | None = None, n: int = 48, seed: int = 0) -> dict:
    from dhg.data.iam import IAMCache
    from dhg.metrics import frechet_style_distance

    cache = IAMCache.load(cache_path)
    rows = np.asarray(cache.strokes)
    if len(rows) < 2 * n:
        raise ValueError(f"need >= {2 * n} rows, cache has {len(rows)}")
    reference, probe = rows[:n], rows[n : 2 * n]

    default_trained = Path(__file__).resolve().parents[2] / "data" / "style_trunk_synth.npz"
    trunks: dict[str, str | None] = {"random_init": "/nonexistent/force_random.npz"}
    tw = weights if weights is not None else (
        str(default_trained) if default_trained.exists() else None
    )
    if tw:
        trunks["trained"] = tw

    result: dict = {"n": n, "levels": list(LEVELS)}
    for name, w in trunks.items():
        fn = feature_fn_for(w)
        scores = {}
        for c in LEVELS:
            scores[str(c)] = round(
                float(frechet_style_distance(corrupt(probe, c, seed), reference, fn)), 6
            )
        vals = [scores[str(c)] for c in LEVELS]
        # Feature-variance diagnostic: a trunk whose embeddings barely vary
        # across real lines cannot separate corruption levels either.
        from dhg.metrics import rasterize_strokes, style_features
        pages = np.stack([rasterize_strokes(s_, width=512) for s_ in probe[:16]])
        fvar = float(style_features(pages, fn).std(axis=0).mean())
        # The level-0 score IS the sampling noise floor (two disjoint real
        # sets); corruption below it is indistinguishable by construction.
        floor = max(vals[0], vals[1], 1e-9)
        above = [v for v in vals[2:]]
        result[name] = {
            "fsd": scores,
            "noise_floor": round(floor, 6),
            "monotone_above_floor": bool(
                all(a < b for a, b in zip(above, above[1:])) and above[0] > floor
            ),
            "range_vs_floor": round(vals[-1] / floor, 1),
            "feature_std": round(fvar, 6),
        }
    print(json.dumps(result))
    return result


def main():
    kv = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "cache" not in kv:
        raise SystemExit("usage: eval_fsd_sensitivity --cache=<packed .npz> [--weights=...] [--n=48]")
    run(kv["cache"], kv.get("weights"), n=int(kv.get("n", 48)), seed=int(kv.get("seed", 0)))


if __name__ == "__main__":
    main()

"""Validation evaluation — a capability superset (the reference never
evaluates its validation split; data/splits.json carries one, SURVEY §2).

Computes the mean diffusion loss over a cache at a fixed grid of alpha_bar
levels (deterministic: no random alpha sampling, fixed noise key per sample),
so val numbers are comparable across runs/steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dhg.core.losses import diffusion_loss
from dhg.core.schedule import get_alpha_set


def make_eval_fn(model, batch_size: int = 0, n_levels: int = 6):
    """Returns eval_step(params, batch, key) -> [3] (total, score, pen).

    The returned closure carries its own jit cache: build it ONCE per
    model and reuse it across validation boundaries (Trainer caches it),
    or every call recompiles (~15 s CPU / 1-6 min remote TPU). batch_size
    is unused (kept for signature compat) — the jit specializes per input
    shape, so one eval_step serves every batch size including the tail.
    """
    alpha_set = get_alpha_set()
    # Evenly spaced schedule indices, always including the extremes.
    idx = jnp.linspace(0, alpha_set.shape[0] - 1, n_levels).astype(jnp.int32)
    levels = alpha_set[idx]

    @jax.jit
    def eval_step(params, strokes3, text, style, key):
        x, pen = strokes3[..., :2], strokes3[..., 2]

        def at_level(alpha):
            alphas = jnp.full((strokes3.shape[0], 1), alpha)
            eps = jax.random.normal(key, x.shape)
            xt = jnp.sqrt(alphas)[..., None] * x + jnp.sqrt(1 - alphas)[..., None] * eps
            eps_pred, pen_pred = model.apply(
                {"params": params}, xt, text, jnp.sqrt(alphas), style
            )
            total, score, pen_l = diffusion_loss(eps, eps_pred, pen, pen_pred, alphas)
            return jnp.stack([total, score, pen_l])

        return jnp.mean(jax.vmap(at_level)(levels), axis=0)

    return eval_step


def evaluate_checkpoint(
    experiment_path: str | None = None,
    config_path: str | None = None,
    checkpoint_path: str | None = None,
    split: str = "validation",
    batch_size: int = 16,
    seed: int = 0,
    use_ema: bool = True,
    n_levels: int = 6,
):
    """Evaluate a saved checkpoint on a data split; returns (total, score, pen).

    Standalone counterpart of the in-training validation loop (capability
    superset — the reference never evaluates its validation split), so
    checkpoints can be compared after the fact:

        python -m dhg.eval --experiment_path=<run dir>            # newest ckpt
        python -m dhg.eval --experiment_path=<run> --split=train --use_ema=False

    Checkpoint/config resolution follows the inference CLI (experiment_path
    supplies config.yml + reference-order checkpoint discovery; explicit
    paths win). use_ema prefers the EMA shadow when present, like infer.
    """
    from pathlib import Path

    from dhg.checkpoint import load_model, resolve_checkpoint
    from dhg.config import DLConfig

    if experiment_path:
        exp = Path(experiment_path)
        if not config_path:
            config_path = str(exp / "config.yml")
        if not checkpoint_path:
            found = resolve_checkpoint(exp)
            if found is not None:
                checkpoint_path = str(found)
    if not config_path or not checkpoint_path:
        raise ValueError(
            "Both config_path and checkpoint_path must be provided, "
            "either directly or via experiment_path."
        )

    model, params = load_model(config_path, checkpoint_path, use_ema=use_ema)
    cfg = DLConfig.load(config_path)

    from dhg.train import load_cache

    cache = load_cache(cfg, split)
    if cache is None or len(cache) == 0:
        raise RuntimeError(f"no samples in the {split!r} split")
    return evaluate(
        model,
        params,
        cache,
        batch_size=min(batch_size, len(cache)),
        seed=seed,
        eval_step=make_eval_fn(model, n_levels=n_levels),
    )


def main(argv=None) -> None:
    import sys

    from dhg.config import parse_cli_kwargs

    kwargs = parse_cli_kwargs(argv if argv is not None else sys.argv[1:], help_text=__doc__)
    total, score, pen = evaluate_checkpoint(**kwargs)
    # Same fields/format as the train loop's val log line (train.py).
    print(f"Val Loss: {total:.3f} | Val Score: {score:.3f} | Val Pen: {pen:.3f}")


def evaluate(model, params, cache, batch_size: int = 16, seed: int = 0, eval_step=None):
    """Mean (total, score, pen) loss over a packed cache.

    eval_step: a prebuilt make_eval_fn closure — pass it to avoid a fresh
    jit cache (and thus a recompile) per evaluate() call."""
    import numpy as np

    if eval_step is None:
        eval_step = make_eval_fn(model, batch_size)
    n = len(cache)
    key = jax.random.PRNGKey(seed)
    totals, weights = [], []
    # Every sample contributes: the tail batch (n % batch_size) runs at its
    # natural size (one extra compile) and the mean is sample-weighted.
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        m = eval_step(
            params,
            jnp.asarray(cache.strokes[sl]),
            jnp.asarray(cache.text[sl]),
            jnp.asarray(cache.style[sl]),
            jax.random.fold_in(key, i),
        )
        totals.append(np.asarray(m))
        weights.append(sl.stop - sl.start)
    return np.average(np.stack(totals), axis=0, weights=weights)


if __name__ == "__main__":
    main()

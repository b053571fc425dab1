"""Average N checkpoints into one (SWA / model-soup style) — superset.

Uniform (or weighted) parameter averaging over the tail of a training run
is a standard cheap ensemble for diffusion models (Izmailov et al. 2018,
"Averaging Weights Leads to Wider Optima"; complements the in-training EMA
shadow, which averages geometrically). The reference has no equivalent —
its checkpoints are save-only (reference train.py:123-137).

Usage:
    python -m dhg.tools.average_checkpoints \
        --dst <out dir> --srcs <ckpt dir>,<ckpt dir>[,...] [--weights 1,2,...]
    # or average every numbered checkpoint of a run:
    python -m dhg.tools.average_checkpoints --dst <out dir> \
        --experiment_path <run dir> [--last 3]

The output is a plain params checkpoint (orbax dir) that load_model /
infer / serve / export_torch_checkpoint accept like any other. When every
source carries an EMA shadow, the shadows are averaged too and stored as
ema_params (preferred at inference, as usual); if any source lacks one,
the output carries none.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def average_trees(trees: list, weights: list[float] | None = None):
    """Weighted elementwise average of identically-structured pytrees."""
    import jax

    if not trees:
        raise ValueError("no trees to average")
    if weights is None:
        weights = [1.0] * len(trees)
    if len(weights) != len(trees):
        raise ValueError(f"{len(weights)} weights for {len(trees)} trees")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = [float(w) / total for w in weights]

    def avg(*leaves):
        out = np.zeros_like(np.asarray(leaves[0], np.float64))
        for w, leaf in zip(norm, leaves):
            out += w * np.asarray(leaf, np.float64)
        return out.astype(np.asarray(leaves[0]).dtype)

    return jax.tree.map(avg, *trees)


def average_checkpoints(
    srcs: list[str | Path],
    dst: str | Path,
    weights: list[float] | None = None,
) -> dict:
    """Average the params (and, when all present, ema_params) of `srcs`
    into a new checkpoint at `dst`. Returns the payload that was saved."""
    from dhg.checkpoint import load_checkpoint, save_checkpoint

    if len(srcs) < 2:
        raise ValueError("need at least two checkpoints to average")
    restored = [load_checkpoint(s) for s in srcs]
    params = average_trees([r["params"] for r in restored], weights)
    payload = {"params": params}
    if all("ema_params" in r for r in restored):
        payload["ema_params"] = average_trees(
            [r["ema_params"] for r in restored], weights
        )
    save_checkpoint(
        Path(dst),
        payload["params"],
        ema_params=payload.get("ema_params"),
        meta={"averaged_from": ",".join(str(s) for s in srcs)},
    )
    return payload


def numbered_checkpoints(experiment_path: str | Path, last: int = 0) -> list[Path]:
    """checkpoint_<N> dirs of a run in step order; `last` keeps the tail."""
    exp = Path(experiment_path)
    numbered = []
    for p in exp.glob("checkpoint_*"):
        try:
            numbered.append((int(p.name.split("_")[1]), p))
        except ValueError:
            continue
    paths = [p for _, p in sorted(numbered)]
    return paths[-last:] if last else paths


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dst", required=True, help="output checkpoint dir")
    ap.add_argument("--srcs", help="comma-separated checkpoint dirs")
    ap.add_argument("--experiment_path", help="run dir: average its checkpoint_<N>s")
    ap.add_argument("--last", type=int, default=0, help="with --experiment_path: only the last N")
    ap.add_argument("--weights", help="comma-separated weights (default uniform)")
    args = ap.parse_args()

    if bool(args.srcs) == bool(args.experiment_path):
        raise SystemExit("provide exactly one of --srcs or --experiment_path")
    if args.srcs:
        srcs = [s for s in args.srcs.split(",") if s.strip()]
    else:
        srcs = numbered_checkpoints(args.experiment_path, last=args.last)
        if len(srcs) < 2:
            raise SystemExit(
                f"found {len(srcs)} numbered checkpoints under "
                f"{args.experiment_path}; need at least 2"
            )
    weights = None
    if args.weights:
        weights = [float(w) for w in args.weights.split(",") if w.strip()]

    payload = average_checkpoints(srcs, args.dst, weights)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(payload["params"]))
    print(
        f"wrote {args.dst}: mean of {len(srcs)} checkpoints, {n} params"
        + (" (+ema)" if "ema_params" in payload else "")
    )


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()

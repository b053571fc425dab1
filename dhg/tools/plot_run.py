"""Plot training curves from a run dir — metrics.jsonl or run.log.

Observability superset: the reference records losses only as run.log text
(reference train.py:111-121, utils/log.py:44-60). dhg additionally writes a
machine-readable metrics.jsonl at every log/val boundary (dhg/train.py),
and this tool renders either source to a PNG — including the REFERENCE'S
own run.log (identical log-line format by design), so the shipped
data/best_exp/run.log plots directly:

    python -m dhg.tools.plot_run --experiment_path <run dir> [--output out.png]
    python -m dhg.tools.plot_run --log /root/reference/data/best_exp/run.log

The figure overlays total/score/pen train curves plus validation points
when present (log-scale y — diffusion losses span decades over warmup).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

# The shared log-line contract (reference train.py:111-121; dhg emits the
# same line). Val lines are a dhg superset.
_TRAIN_RE = re.compile(
    r"Step (\d+) \| Loss: ([\d.eE+-]+) \| Score: ([\d.eE+-]+) \| Pen: ([\d.eE+-]+)"
)
_VAL_RE = re.compile(
    r"Step (\d+) \| Val Loss: ([\d.eE+-]+) \| Val Score: ([\d.eE+-]+) \| Val Pen: ([\d.eE+-]+)"
)


def parse_log(text: str) -> dict[str, list]:
    """Extract train/val loss rows from run.log text (either framework)."""
    hist: dict[str, list] = {"train": [], "val": []}
    for line in text.splitlines():
        m = _TRAIN_RE.search(line)
        if m:
            step, loss, score, pen = m.groups()
            hist["train"].append(
                {"step": int(step), "loss": float(loss), "score": float(score), "pen": float(pen)}
            )
            continue
        m = _VAL_RE.search(line)
        if m:
            step, loss, score, pen = m.groups()
            hist["val"].append(
                {
                    "step": int(step),
                    "val_loss": float(loss),
                    "val_score": float(score),
                    "val_pen": float(pen),
                }
            )
    return hist


def parse_jsonl(text: str) -> dict[str, list]:
    """Extract train/val rows from a dhg metrics.jsonl."""
    hist: dict[str, list] = {"train": [], "val": []}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        hist["val" if "val_loss" in rec else "train"].append(rec)
    return hist


def load_history(experiment_path: str | Path | None = None, log: str | Path | None = None):
    """History from a run dir (metrics.jsonl preferred, run.log fallback)
    or an explicit log/jsonl file path."""
    if log is not None:
        p = Path(log)
        text = p.read_text()
        return parse_jsonl(text) if p.suffix == ".jsonl" else parse_log(text)
    run = Path(experiment_path or ".")
    if (run / "metrics.jsonl").exists():
        return parse_jsonl((run / "metrics.jsonl").read_text())
    if (run / "run.log").exists():
        return parse_log((run / "run.log").read_text())
    raise FileNotFoundError(f"no metrics.jsonl or run.log under {run}")


def plot_history(hist: dict[str, list], output: str | Path) -> Path:
    """Render the curves to a PNG; returns the written path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not hist["train"] and not hist["val"]:
        raise ValueError("history contains no loss rows")

    fig, ax = plt.subplots(figsize=(9, 5))
    if hist["train"]:
        steps = [r["step"] for r in hist["train"]]
        for key, style in (("loss", "-"), ("score", "--"), ("pen", ":")):
            ax.plot(steps, [r[key] for r in hist["train"]], style, label=f"train {key}")
    if hist["val"]:
        vsteps = [r["step"] for r in hist["val"]]
        ax.plot(vsteps, [r["val_loss"] for r in hist["val"]], "o-", ms=4, label="val loss")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    out = Path(output)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--experiment_path", help="run dir with metrics.jsonl or run.log")
    ap.add_argument("--log", help="explicit run.log / metrics.jsonl file path")
    ap.add_argument("--output", default=None, help="output PNG (default: <run>/loss_curves.png)")
    args = ap.parse_args(argv)
    if not args.experiment_path and not args.log:
        ap.error("one of --experiment_path / --log is required")

    hist = load_history(args.experiment_path, args.log)
    base = Path(args.experiment_path) if args.experiment_path else Path(args.log).parent
    out = plot_history(hist, args.output or base / "loss_curves.png")
    n_t, n_v = len(hist["train"]), len(hist["val"])
    print(f"wrote {out} ({n_t} train rows, {n_v} val rows)")


if __name__ == "__main__":
    main()

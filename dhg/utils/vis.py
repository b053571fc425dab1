"""Stroke rendering (behavior parity with reference utils/vis.py:5-49).

Rendering contract, reproduced exactly:
  * absolute positions = cumsum of the (dx, dy) deltas;
  * the pen channel is rounded; a 1 at index i means the segment ARRIVING at
    point i was a pen-up move, so point i is excluded from the polyline it
    terminates and starts the next one;
  * anything after the LAST pen-up point is not drawn (reference loop quirk);
  * figure is (scale * w/h, scale) inches, axes off, saved to ./<name>.png.

Implementation differs from the reference: instead of one plt.plot call per
segment, the polyline is drawn in a single call with NaN breaks inserted at
pen-up points (same pixels, O(1) matplotlib calls).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt


def show_strokes(
    strokes: np.ndarray,
    name: str = "",
    show_output: bool = True,
    scale: int = 1,
) -> None:
    """Render a [T, 3] (dx, dy, pen) stroke sequence."""
    seq = np.asarray(strokes, dtype=float)
    xy = np.cumsum(seq[:, :2], axis=0)
    pen_up = np.flatnonzero(seq[:, 2].round() == 1)

    extent = xy.max(axis=0) - xy.min(axis=0)
    w, h = float(extent[0]), max(float(extent[1]), 1e-6)

    plt.figure(figsize=(min(scale * w / h, 100.0), scale))
    plt.axis("off")

    if pen_up.size:
        # Draw only up to the last pen-up point; break lines by masking the
        # pen-up points themselves to NaN (they belong to no polyline *end*
        # — each starts the following segment, so re-insert it as NaN row
        # followed by the point itself starting the next run).
        last = pen_up[-1]
        pts = xy[:last].astype(float)
        breaks = pen_up[pen_up < last]
        # Build plot array with an extra NaN row before each break point.
        nan_row = np.full((1, 2), np.nan)
        pieces = []
        prev = 0
        for b in breaks:
            pieces.append(pts[prev:b])
            pieces.append(nan_row)
            prev = b
        pieces.append(pts[prev:])
        path = np.concatenate(pieces, axis=0)
        plt.plot(path[:, 0], path[:, 1], color="black")

    if name:
        # Reference behavior: relative names save to ./<name>.png
        # (utils/vis.py:32). Absolute paths save where they point (the
        # reference would mangle them into ".//abs/path").
        import os

        target = f"{name}.png" if os.path.isabs(str(name)) else f"./{name}.png"
        plt.savefig(target, bbox_inches="tight")
    if show_output:
        plt.show()
    else:
        plt.close()


def show_image(**images: np.ndarray) -> None:
    """Plot images in one row (debug helper)."""
    n = len(images)
    for i, image in enumerate(images.values()):
        plt.figure(figsize=(10, 5))
        plt.subplot(1, n, i + 1)
        plt.xticks([])
        plt.yticks([])
        plt.imshow(image, cmap="gray")
    plt.show()

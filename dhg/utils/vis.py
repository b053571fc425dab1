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


def drawn_segments(strokes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Absolute points and the drawn-segment mask for a [T, 3] sequence.

    Returns (xy [T, 2] float, draw [T-1] bool) where draw[i] is True iff
    the segment xy[i] -> xy[i+1] is part of the rendered polyline under
    show_strokes' contract (reference utils/vis.py:5-36): segments ending
    at a pen-up point are skipped, and nothing at-or-after the LAST pen-up
    point is drawn. A sequence with no pen-up point draws nothing
    (reference loop quirk). Shared by the PNG renderer, the SVG writer,
    and the metrics rasterizer (dhg.metrics.rasterize_strokes).
    """
    seq = np.asarray(strokes, dtype=float)
    xy = np.cumsum(seq[:, :2], axis=0)
    draw = np.zeros(max(len(seq) - 1, 0), dtype=bool)
    pen_up = np.flatnonzero(seq[:, 2].round() == 1)
    if pen_up.size:
        last = pen_up[-1]
        draw[: max(last - 1, 0)] = True  # segments ending at 1..last-1
        draw[pen_up[pen_up < last] - 1] = False  # ...except into a pen-up
    return xy, draw


def compose_lines(
    lines: list[np.ndarray | None],
    line_gap: float | None = None,
    align: str = "left",
) -> np.ndarray:
    """Merge per-line [T, 3] stroke sequences into ONE page-level sequence.

    Capability superset of the reference (whose renderer draws exactly one
    line, utils/vis.py:5-36): the composition happens in stroke space, so
    the result is itself a valid (dx, dy, pen) sequence and every existing
    renderer (show_strokes PNG, strokes_to_svg, the metrics rasterizer)
    draws the page unchanged.

    Exactness contract: each line is first trimmed to its solo-rendered ink
    (nothing at-or-after its last pen-up point is drawn when the line is
    rendered alone — see drawn_segments), then translated into its line
    slot; the move between lines arrives at a pen-up point, so it is never
    drawn. The composed page therefore draws exactly the union of the
    per-line solo renderings, translated — no more, no less (pinned by
    tests/test_wrap.py).

    lines: per-line sequences, top to bottom. None (or a line that draws
    nothing on its own) still occupies a line slot, i.e. renders as a blank
    line — so paragraph gaps compose naturally.
    line_gap: vertical pitch between consecutive line tops, in stroke
    units. None = 1.3 x the tallest line's ink height.
    align: "left" (default) or "center" per-line horizontal alignment.
    """
    if align not in ("left", "center"):
        raise ValueError(f"unknown align {align!r} (expected left or center)")
    slots: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None] = []
    for seq in lines:
        if seq is None or len(seq) == 0:
            slots.append(None)
            continue
        seq = np.asarray(seq, dtype=float)
        xy, draw = drawn_segments(seq)
        if not draw.any():
            slots.append(None)
            continue
        last = int(np.flatnonzero(seq[:, 2].round() == 1)[-1])
        pts = xy[: last + 1]
        pens = seq[: last + 1, 2].copy()
        # Ink bbox over points that participate in a drawn segment (the
        # trimmed tail keeps undrawn lead-in points; don't let them skew
        # alignment).
        dmask = np.zeros(last + 1, dtype=bool)
        idx = np.flatnonzero(draw[:last])
        dmask[idx] = True
        dmask[idx + 1] = True
        lo, hi = pts[dmask].min(axis=0), pts[dmask].max(axis=0)
        slots.append((pts, pens, lo, hi))

    inked = [s for s in slots if s is not None]
    if not inked:
        # No line draws anything: a single no-op row keeps the result a
        # renderable sequence (an empty figure, same as a solo no-ink line).
        return np.zeros((1, 3))
    heights = [hi[1] - lo[1] for _, _, lo, hi in inked]
    widths = [hi[0] - lo[0] for _, _, lo, hi in inked]
    pitch = float(line_gap) if line_gap is not None else 1.3 * max(max(heights), 1e-6)
    page_w = max(widths)

    out_pts: list[np.ndarray] = []
    out_pens: list[np.ndarray] = []
    for i, item in enumerate(slots):
        if item is None:
            continue
        pts, pens, lo, hi = item
        tx = -lo[0] + (0.5 * (page_w - (hi[0] - lo[0])) if align == "center" else 0.0)
        ty = -(i * pitch) - hi[1]  # ink top of line i sits at y = -i * pitch
        if out_pts:
            # The jump from the previous line ARRIVES at this line's first
            # point; flagging that point pen-up makes the renderer skip the
            # connecting segment and start this line's polyline at it. (The
            # point's original flag only governed a segment that was never
            # drawn solo: nothing arrives at a line's first point.)
            pens = pens.copy()
            pens[0] = 1.0
        out_pts.append(pts + np.array([tx, ty]))
        out_pens.append(pens)

    pts_all = np.concatenate(out_pts, axis=0)
    deltas = np.diff(pts_all, axis=0, prepend=np.zeros((1, 2)))
    return np.concatenate([deltas, np.concatenate(out_pens)[:, None]], axis=1)


def strokes_to_svg(
    strokes: np.ndarray,
    stroke_width: float = 1.5,
    color: str = "black",
    scale: float = 1.0,
    pad: float = 4.0,
) -> str:
    """Render a [T, 3] (dx, dy, pen) sequence to an SVG document string.

    Capability superset of the reference (whose only renderer is the
    matplotlib PNG, utils/vis.py:5-36): strokes are intrinsically vector
    data, so the natural lossless export is a vector format. Ink geometry
    matches show_strokes exactly (same drawn segments; y-up flipped to
    SVG's y-down); one <path> holds every polyline as M/L subpaths.
    """
    xy, draw = drawn_segments(strokes)
    if not draw.any():
        return (
            '<svg xmlns="http://www.w3.org/2000/svg" '
            f'width="{2 * pad:.0f}" height="{2 * pad:.0f}"/>'
        )
    pts = np.concatenate([xy[:-1][draw], xy[1:][draw]], axis=0)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    w = (hi[0] - lo[0]) * scale + 2 * pad
    h = max((hi[1] - lo[1]) * scale, 1e-6) + 2 * pad
    to_x = lambda v: pad + (v - lo[0]) * scale
    to_y = lambda v: pad + (hi[1] - v) * scale  # y-up -> y-down

    # Consecutive drawn segments share points: emit one M per run.
    parts: list[str] = []
    pen_down = False
    for i, d in enumerate(draw):
        if not d:
            pen_down = False
            continue
        if not pen_down:
            parts.append(f"M{to_x(xy[i, 0]):.2f} {to_y(xy[i, 1]):.2f}")
            pen_down = True
        parts.append(f"L{to_x(xy[i + 1, 0]):.2f} {to_y(xy[i + 1, 1]):.2f}")
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w:.2f}" '
        f'height="{h:.2f}" viewBox="0 0 {w:.2f} {h:.2f}">'
        f'<path d="{" ".join(parts)}" fill="none" stroke="{color}" '
        f'stroke-width="{stroke_width}" stroke-linecap="round" '
        'stroke-linejoin="round"/></svg>'
    )


def save_strokes(
    strokes: np.ndarray,
    name: str,
    fmt: str = "png",
    show_output: bool = False,
    scale: int = 1,
) -> str:
    """Save a stroke sequence as <name>.png (matplotlib, reference-parity
    pixels) or <name>.svg (vector). Returns the written path."""
    import os

    if fmt == "svg":
        target = f"{name}.svg" if os.path.isabs(str(name)) else f"./{name}.svg"
        with open(target, "w") as f:
            f.write(strokes_to_svg(strokes, scale=float(scale)))
        return target
    if fmt != "png":
        raise ValueError(f"unknown format {fmt!r} (expected png or svg)")
    show_strokes(strokes, name=name, show_output=show_output, scale=scale)
    target = f"{name}.png" if os.path.isabs(str(name)) else f"./{name}.png"
    return target


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

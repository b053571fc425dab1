"""Generate a reference-scale IAM-shaped tree for the full-scale build
dress rehearsal (round-4 verdict item #4).

No IAM files exist in this environment (BASELINE.md), so the cache build
has only ever run on the 192-line integration fixture; the real set is
~1.5k forms / ~10k lines (data/splits.json in the reference: 1534 train +
192 validation forms). This tool writes a tree with the exact layout the
build scans (reference dataset.py:62-150):

    <root>/ascii/<a01>/<a01-000>/<form>.txt         CSR: transcription
    <root>/lineStrokes/<a01>/<a01-000>/<form>-<nn>.xml
    <root>/lineImages/<a01>/<a01-000>/<form>-<nn>.tif
    <root>/splits.json

Content is synthetic but drop-filter-realistic: a few % of lines exercise
each of the reference's three drop rules (text >= max_text_len, stroke seq
too long after 3x combine, image >= img_width after trim), per-form
"writer" parameters (slant/step/amplitude) vary so style sources are
meaningfully form-correlated, and raw point counts (~500-900/line) land in
the real IAM range so the native scanner and combine_strokes see
production-shaped input.

Run:  python -m dhg.tools.gen_iam_scale --root=/tmp/iam_scale
      [--train_forms=1534] [--val_forms=192] [--seed=7]
Then: build_iam_cache(data_dir=<root>, splits_file=<root>/splits.json, ...)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

WORDS = (
    "the quick brown fox jumps over a lazy dog and then runs far away "
    "while some other animals watch from near trees with great interest "
    "writing lines of text by hand takes time but looks rather nice "
    "every form has several sentences that differ in length and style"
).split()


def _line_text(rng: np.random.RandomState, force_long: bool = False) -> str:
    words = [WORDS[rng.randint(len(WORDS))] for _ in range(rng.randint(4, 11))]
    s = " ".join(words)
    if force_long:
        while len(s) < 50:  # trips the len(text) >= max_text_len drop filter
            s += " " + WORDS[rng.randint(len(WORDS))]
        return s
    return s[:49]


def _stroke_xml(
    rng: np.random.RandomState,
    n_points: int,
    slant: float,
    step: float,
    amp: float,
    freq: float = 35.0,
) -> tuple[str, list[np.ndarray]]:
    """One line's XML + its stroke point arrays: a rightward-drifting
    jittered walk split into strokes (IAM coordinates are absolute pen
    positions in the thousands). The points are returned so the line IMAGE
    can be rasterized from the SAME trajectory — like real IAM, where the
    image depicts the strokes, the style image carries genuine mutual
    information about the writer's stroke statistics (slant / amplitude /
    frequency). The first cut of this generator drew unrelated scribbles;
    a model trained on that cache measurably learned to IGNORE style
    (round-3 finding reproduced), which is exactly the failure this
    coupling removes."""
    n_strokes = max(3, n_points // rng.randint(40, 90))
    sizes = np.full(n_strokes, n_points // n_strokes)
    sizes[: n_points - sizes.sum()] += 1
    x = 100.0 + rng.rand() * 500
    base_y = 200.0 + rng.rand() * 800
    parts = ["<WhiteboardCaptureSession><StrokeSet>"]
    stroke_pts: list[np.ndarray] = []
    for sz in sizes:
        t = np.arange(int(sz))
        dx = step + rng.randn(int(sz)) * 2.0
        xs = x + np.cumsum(dx)
        # freq is a PER-WRITER trait (with small per-stroke jitter): unlike
        # amp/step, oscillation frequency survives the per-line std
        # normalization of the stroke parser, so it carries writer identity
        # into normalized stroke space — the signal the style-conditioning
        # pathway can actually exploit.
        ys = base_y + amp * np.sin(xs / (freq * (0.9 + 0.2 * rng.rand()))) + slant * (xs - x)
        ys += rng.randn(int(sz)) * 1.5
        x = xs[-1] + step * rng.randint(2, 6)
        xi, yi = xs.astype(np.int64), ys.astype(np.int64)
        pts = "".join(
            f'<Point x="{px}" y="{py}" time="{tt}"/>'
            for px, py, tt in zip(xi, yi, t)
        )
        parts.append("<Stroke>" + pts + "</Stroke>")
        stroke_pts.append(np.stack([xi, yi], 1).astype(np.float64))
    parts.append("</StrokeSet></WhiteboardCaptureSession>")
    return "".join(parts), stroke_pts


def _line_image(
    rng: np.random.RandomState,
    stroke_pts: list[np.ndarray],
    pen_px: int,
    height: int = 140,
    force_wide: bool = False,
) -> np.ndarray:
    """Rasterize the line's own strokes into a [height, width] grayscale
    image (dark ink on white, per-form pen thickness). The ink is scaled to
    ~65 px tall; lines whose aspect would exceed the post-resize img_width
    drop threshold are horizontally compressed to stay under it (so ~all
    lines survive the reference's width filter), except force_wide ones,
    which are left wide to exercise that filter."""
    import cv2

    all_pts = np.concatenate(stroke_pts)
    lo, hi = all_pts.min(0), all_pts.max(0)
    ink_h = max(hi[1] - lo[1], 1.0)
    scale_y = 65.0 / ink_h
    sx = scale_y
    w = (hi[0] - lo[0]) * sx
    if w > 840 and not force_wide:
        sx *= 840.0 / w
    width = int((hi[0] - lo[0]) * sx) + 16
    img = np.full((height, width), 255, np.uint8)
    y0 = (height - 65) / 2.0
    for pts in stroke_pts:
        px = ((pts[:, 0] - lo[0]) * sx + 8).astype(np.int32)
        py = ((pts[:, 1] - lo[1]) * scale_y + y0).astype(np.int32)
        poly = np.stack([px, py], 1).reshape(-1, 1, 2)
        cv2.polylines(img, [poly], False, 0, thickness=pen_px, lineType=cv2.LINE_AA)
    return img


def main(
    root: str = "/tmp/iam_scale",
    train_forms: int = 1534,
    val_forms: int = 192,
    lines_per_form: int = 7,
    seed: int = 7,
):
    import cv2

    t0 = time.time()
    root_p = Path(root)
    rng = np.random.RandomState(seed)
    prefixes = [f"{c}{i:02d}" for c in "abcdefghjklmnp" for i in range(16)]

    splits: dict[str, list[str]] = {"train": [], "validation": []}
    n_lines = 0
    counters: dict[str, int] = {}
    for kind, n_forms in (("train", train_forms), ("validation", val_forms)):
        for _ in range(n_forms):
            pre = prefixes[rng.randint(len(prefixes))]
            idx = counters.get(pre, 0)
            counters[pre] = idx + 1
            form = f"{pre}-{idx:03d}{'uxz'[rng.randint(3)] if rng.rand() < 0.3 else ''}"
            splits[kind].append(form)
            d1, d2 = form[:3], form[:7]
            for sub in ("ascii", "lineStrokes", "lineImages"):
                (root_p / sub / d1 / d2).mkdir(parents=True, exist_ok=True)

            # Per-form "writer" bundle: slant/step/amplitude.
            slant = rng.randn() * 0.06
            step = 6.0 + rng.rand() * 6.0
            amp = 15.0 + rng.rand() * 25.0
            freq = 18.0 + rng.rand() * 50.0  # per-writer oscillation period
            pen_px = rng.randint(1, 4)  # per-form pen thickness (image only)

            k = max(3, lines_per_form + rng.randint(-2, 3))
            texts = []
            for i in range(1, k + 1):
                sid = f"{form}-{i:02d}"
                # ~3% overlong text, ~2% overlong strokes, ~2% overwide image:
                # each exercises one reference drop filter at realistic rates.
                long_text = rng.rand() < 0.03
                texts.append(_line_text(rng, force_long=long_text))
                n_pts = rng.randint(500, 900)
                if rng.rand() < 0.02:
                    n_pts = rng.randint(1300, 1800)  # survives 3x combine > 480
                xml, stroke_pts = _stroke_xml(rng, n_pts, slant, step, amp, freq)
                (root_p / "lineStrokes" / d1 / d2 / f"{sid}.xml").write_text(xml)
                # The image is rasterized from the SAME strokes (see
                # _line_image); ~2% keep their natural (wide) aspect to
                # exercise the >= img_width drop filter after read_img's
                # crop-and-resize-to-96.
                cv2.imwrite(
                    str(root_p / "lineImages" / d1 / d2 / f"{sid}.tif"),
                    _line_image(rng, stroke_pts, pen_px, force_wide=rng.rand() < 0.02),
                )
                n_lines += 1
            (root_p / "ascii" / d1 / d2 / f"{form}.txt").write_text(
                "OCR:\n\nx\n\nCSR:\n\n" + "\n".join(texts) + "\n"
            )

    (root_p / "splits.json").write_text(json.dumps(splits))
    du = sum(f.stat().st_size for f in root_p.rglob("*") if f.is_file())
    print(
        json.dumps(
            {
                "root": str(root_p),
                "train_forms": len(splits["train"]),
                "val_forms": len(splits["validation"]),
                "lines": n_lines,
                "disk_mb": round(du / 1e6, 1),
                "gen_s": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    kw = {}
    for arg in sys.argv[1:]:
        if arg.startswith("--") and "=" in arg:
            k, v = arg[2:].split("=", 1)
            kw[k] = v if k == "root" else int(v)
    main(**kw)

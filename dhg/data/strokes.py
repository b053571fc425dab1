"""IAM-OnDB stroke parsing, simplification and padding — offline numpy path.

Behavior parity (paths in /root/reference/diffusion_handwriting_generation/):
  * parse_strokes_xml (utils/io.py:11-66): <StrokeSet><Stroke><Point x y>
    -> deltas (dx, -dy); pen-lift marks the last point of each stroke, then
    the channel is ROLLED by +1 ("a stroke that is not drawn has a 1");
    coordinates normalized by the global std of both delta channels;
    combine_strokes applied 3x, each pass merging the 20% most-collinear
    consecutive pairs.
  * combine_strokes (utils/io.py:118-147): score = |a| + |b| - |a+b| over
    even/odd pairs; the n lowest-scoring pairs are summed (pen-lift OR'd);
    re-normalized by std after each pass.
  * pad_stroke_seq (utils/preprocessing.py:4-26): pad to max length with
    (0, 0, 1) rows; returns None (sample dropped) if too long or any
    |coordinate| > 15.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from os import PathLike

import numpy as np


def parse_strokes_xml(xml_path: PathLike | str) -> np.ndarray:
    """Parse an IAM stroke XML file -> [N, 3] array of (dx, dy, pen_lift)."""
    root = ET.parse(xml_path).getroot()
    stroke_set = root.find("StrokeSet")
    if stroke_set is None:
        raise ValueError(f"no StrokeSet in {xml_path}")

    # Gather absolute points with per-stroke end markers, file order.
    xs, ys, ends = [], [], []
    for stroke in stroke_set.findall("Stroke"):
        points = stroke.findall("Point")
        for idx, p in enumerate(points):
            xs.append(int(p.attrib["x"]))
            ys.append(int(p.attrib["y"]))
            ends.append(1.0 if idx == len(points) - 1 else 0.0)

    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)

    # Deltas between consecutive points (across stroke boundaries), y negated.
    strokes = np.stack(
        [xs[1:] - xs[:-1], -(ys[1:] - ys[:-1]), ends[1:]], axis=1
    )
    # Roll the pen channel by +1: the segment AFTER a pen-up is "not drawn".
    strokes[:, 2] = np.roll(strokes[:, 2], 1)
    # Normalize by the global std over both delta channels.
    strokes[:, :2] /= np.std(strokes[:, :2])

    return simplify_strokes(strokes, passes=3, frac=0.2)


def simplify_strokes(strokes: np.ndarray, passes: int = 3, frac: float = 0.2) -> np.ndarray:
    """combine_strokes applied `passes` times, each merging frac of pairs.

    Uses the native C++ pipeline (dhg.native) when available; the numpy path
    below is the reference implementation and produces identical output
    (both use stable cost ordering).
    """
    from dhg.native import simplify_strokes_native

    out = simplify_strokes_native(strokes, passes=passes, frac=frac)
    if out is not None:
        return out
    for _ in range(passes):
        strokes = combine_strokes(strokes, int(len(strokes) * frac))
    return strokes


def combine_strokes(x: np.ndarray, n: int) -> np.ndarray:
    """Merge the n most-collinear consecutive (even, odd) delta pairs."""
    s = x[::2, :2]
    s_neighbors = x[1::2, :2]
    if len(x) % 2 != 0:
        s = s[:-1]

    def norms(v):
        return np.linalg.norm(v, axis=1)

    # Stable ordering so ties (exactly-collinear pairs) resolve identically
    # in the numpy and native paths. (The reference's unstable introsort
    # leaves tie order unspecified anyway, utils/io.py:141.)
    values = norms(s) + norms(s_neighbors) - norms(s + s_neighbors)
    ind = np.argsort(values, kind="stable")[:n]

    x[ind * 2] += x[ind * 2 + 1]
    x[ind * 2, 2] = np.greater(x[ind * 2, 2], 0)
    x = np.delete(x, ind * 2 + 1, axis=0)
    x[:, :2] /= np.std(x[:, :2])
    return x


def pad_stroke_seq(x: np.ndarray, maxlength: int) -> np.ndarray | None:
    """Pad to [maxlength, 3] with (0, 0, 1) rows; None if too long/out of range."""
    if len(x) > maxlength or np.amax(np.abs(x)) > 15:
        return None
    pad = np.concatenate(
        [np.zeros((maxlength - len(x), 2)), np.ones((maxlength - len(x), 1))], axis=-1
    )
    return np.concatenate([x, pad]).astype(np.float32)


def parse_lines_txt(ascii_path) -> dict[str, str]:
    """Parse an IAM ascii transcription: lines after the CSR marker.

    Returns {"<form>-<nn:02d>": text}. Matches utils/io.py:69-95: the line
    counter starts at -1 when CSR is seen (skipping CSR's own line and the
    blank after it), and the trailing newline is stripped via line[:-1].
    """
    texts: dict[str, str] = {}
    has_started = False
    lines_num = -1
    stem = str(ascii_path).rsplit("/", 1)[-1].rsplit(".", 1)[0]

    with open(ascii_path) as f:
        for line in f.readlines():
            if "CSR" in line:
                has_started = True
            if has_started:
                if lines_num > 0 and line.strip():
                    texts[f"{stem}-{lines_num:02d}"] = line[:-1]
                lines_num += 1
    return texts

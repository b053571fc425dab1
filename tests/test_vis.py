"""Renderer semantics: segment splitting, tail truncation, PNG output."""

import numpy as np
import pytest

from dhg.utils import vis


def _collect_plots(monkeypatch):
    calls = []

    def fake_plot(xs, ys, **kw):
        calls.append((np.asarray(xs), np.asarray(ys)))

    monkeypatch.setattr(vis.plt, "plot", fake_plot)
    monkeypatch.setattr(vis.plt, "figure", lambda **kw: None)
    monkeypatch.setattr(vis.plt, "axis", lambda *a, **kw: None)
    monkeypatch.setattr(vis.plt, "close", lambda *a, **kw: None)
    monkeypatch.setattr(vis.plt, "savefig", lambda *a, **kw: None)
    return calls


def test_segments_split_at_pen_up(monkeypatch):
    calls = _collect_plots(monkeypatch)
    strokes = np.zeros((10, 3))
    strokes[:, 0] = 1.0
    strokes[:, 1] = 0.5
    strokes[4, 2] = 1.0
    strokes[8, 2] = 1.0
    vis.show_strokes(strokes, show_output=False)

    assert len(calls) == 1
    xs, ys = calls[0]
    # Drawn points stop at the LAST pen-up (index 8): tail never rendered.
    finite = np.isfinite(xs)
    # One NaN break for the intermediate pen-up at index 4.
    assert (~finite).sum() == 1
    # Points drawn: indices 0..7 (8 points) — index 4 excluded from the
    # first segment but starts the second.
    assert finite.sum() == 8


def test_no_pen_up_draws_nothing(monkeypatch):
    calls = _collect_plots(monkeypatch)
    strokes = np.zeros((6, 3))
    strokes[:, 0] = 1.0
    strokes[:, 1] = np.linspace(0.1, 1, 6)
    vis.show_strokes(strokes, show_output=False)
    # Reference behavior: without any pen-up marker no segment is emitted.
    assert calls == []


def test_png_written(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    strokes = np.zeros((12, 3))
    strokes[:, 0] = 1.0
    strokes[:, 1] = np.sin(np.arange(12) / 2.0)
    strokes[-1, 2] = 1.0
    vis.show_strokes(strokes, name="out", show_output=False)
    assert (tmp_path / "out.png").exists()


def _seq(dxs, dys, pens):
    return np.stack(
        [np.asarray(dxs, float), np.asarray(dys, float), np.asarray(pens, float)],
        axis=1,
    )


def test_svg_structure_and_pen_breaks():
    # Two dashes with a pen-up jump between them -> two M subpaths.
    seq = _seq([0, 5, 5, 9, 5, 5, 0], [0] * 7, [0, 0, 0, 1, 0, 0, 1])
    svg = vis.strokes_to_svg(seq)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("M") == 2  # one pen-down run per dash
    assert 'fill="none"' in svg

    # Same drawn segments as the PNG renderer's contract.
    _, draw = vis.drawn_segments(seq)
    n_L = svg.count("L")
    assert n_L == int(draw.sum())


def test_svg_y_axis_flipped():
    # A stroke moving UP (dy > 0) must move toward SMALLER svg y.
    seq = _seq([1, 1, 1, 0], [0, 3, 3, 0], [0, 0, 0, 1])
    svg = vis.strokes_to_svg(seq, pad=0.0)
    import re

    ys = [float(m) for m in re.findall(r"[ML]\S+ (\d+\.\d+)", svg)]
    assert ys == sorted(ys, reverse=True)


def test_svg_no_pen_up_is_empty_document():
    svg = vis.strokes_to_svg(_seq([1, 1], [1, 1], [0, 0]))
    assert "<path" not in svg


def test_save_strokes_svg_and_png(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    seq = _seq([0, 2, 2, 0], [0, 1, -1, 0], [0, 0, 0, 1])
    p_svg = vis.save_strokes(seq, "out", fmt="svg")
    assert (tmp_path / "out.svg").exists()
    assert p_svg.endswith("out.svg")
    p_png = vis.save_strokes(seq, "out", fmt="png")
    assert (tmp_path / "out.png").exists() and p_png.endswith("out.png")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        vis.save_strokes(seq, "out", fmt="pdf")

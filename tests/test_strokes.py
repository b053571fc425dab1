"""Stroke parsing goldens on crafted XML (reference utils/io.py:11-66)."""

import numpy as np
import pytest

from dhg.data.strokes import combine_strokes, pad_stroke_seq, parse_lines_txt

XML = """<WhiteboardCaptureSession>
  <StrokeSet>
    <Stroke>
      <Point x="100" y="200"/>
      <Point x="110" y="205"/>
      <Point x="120" y="210"/>
    </Stroke>
    <Stroke>
      <Point x="150" y="220"/>
      <Point x="160" y="225"/>
    </Stroke>
  </StrokeSet>
</WhiteboardCaptureSession>
"""


def _write_xml(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text(XML)
    return p


@pytest.mark.parametrize("path", ["native", "elementtree"])
def test_parse_deltas_and_roll(tmp_path, monkeypatch, path):
    # Disable combine passes to check the raw parse output, on BOTH parse
    # paths (the native scanner and the ElementTree reference/fallback).
    import dhg.data.strokes as S
    import dhg.native as N

    monkeypatch.setattr(S, "simplify_strokes", lambda x, passes=3, frac=0.2: x)
    if path == "native":
        if N.get_lib() is None:
            pytest.skip("native lib unavailable")
        out = N.parse_strokes_xml_native(_write_xml(tmp_path))  # parse-only
    else:
        monkeypatch.setattr(N, "parse_strokes_xml_native", lambda *a, **k: None)
        out = S.parse_strokes_xml(_write_xml(tmp_path))
    # 5 points -> 4 deltas.
    assert out.shape == (4, 3)
    raw = np.array(
        [
            [10, -5, 0.0],  # p0->p1
            [10, -5, 1.0],  # p1->p2 (p2 ends stroke 1)
            [30, -10, 0.0],  # p2->p3 (cross-stroke jump)
            [10, -5, 1.0],  # p3->p4 (p4 ends stroke 2)
        ],
        dtype=float,
    )
    # Pen channel rolled by +1: the segment AFTER a pen-up is flagged.
    expected_pen = np.roll(raw[:, 2], 1)
    assert np.allclose(out[:, 2], expected_pen)
    # Coordinates normalized by global std of the raw deltas.
    expected_xy = raw[:, :2] / np.std(raw[:, :2])
    assert np.allclose(out[:, :2], expected_xy, rtol=1e-6)


def test_combine_strokes_merges_collinear():
    # Two perfectly collinear pairs and one orthogonal pair.
    x = np.array(
        [
            [1.0, 0.0, 0.0],
            [1.0, 0.0, 1.0],  # collinear with prev -> zero cost, pen OR'd
            [0.0, 1.0, 0.0],
            [1.0, 0.0, 0.0],  # orthogonal -> high cost
            [2.0, 0.0, 0.0],
            [2.0, 0.0, 0.0],  # collinear
        ]
    )
    out = combine_strokes(x.copy(), 2)
    assert out.shape == (4, 3)
    # The merged first pair keeps pen lift 1.
    assert out[0, 2] == 1.0
    # std-normalized after merge.
    assert np.isclose(np.std(out[:, :2]), 1.0, rtol=1e-6)


def test_pad_stroke_seq_pads_with_pen_up():
    x = np.zeros((5, 3))
    out = pad_stroke_seq(x, 8)
    assert out.shape == (8, 3)
    assert np.all(out[5:, 2] == 1.0)
    assert np.all(out[5:, :2] == 0.0)
    assert out.dtype == np.float32


def test_pad_stroke_seq_drops_bad():
    assert pad_stroke_seq(np.zeros((9, 3)), 8) is None
    big = np.zeros((4, 3))
    big[0, 0] = 16.0
    assert pad_stroke_seq(big, 8) is None


def test_parse_lines_txt(tmp_path):
    txt = tmp_path / "a01-000u.txt"
    txt.write_text(
        "OCR:\n\nbad text\n\nCSR:\n\nA MOVE to stop\nsecond line\n"
    )
    out = parse_lines_txt(txt)
    assert out == {
        "a01-000u-01": "A MOVE to stop",
        "a01-000u-02": "second line",
    }

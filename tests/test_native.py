"""Native C++ stroke kernels vs the numpy reference implementation."""

import numpy as np
import pytest

from dhg.data.strokes import combine_strokes
from dhg.native import combine_strokes_native, get_lib, simplify_strokes_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def _random_strokes(n, seed):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(n, 3)
    xyz[:, 2] = (rng.rand(n) < 0.1).astype(float)
    xyz[:, :2] /= np.std(xyz[:, :2])
    return xyz


@pytest.mark.parametrize("n,seed", [(100, 0), (101, 1), (37, 2), (512, 3)])
def test_combine_pass_matches_numpy(n, seed):
    xyz = _random_strokes(n, seed)
    n_merge = int(n * 0.2)
    ref = combine_strokes(xyz.copy(), n_merge)
    out = combine_strokes_native(xyz.copy(), n_merge)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n,seed", [(240, 4), (333, 5)])
def test_full_pipeline_matches_numpy(n, seed):
    xyz = _random_strokes(n, seed)
    ref = xyz.copy()
    for _ in range(3):
        ref = combine_strokes(ref, int(len(ref) * 0.2))
    out = simplify_strokes_native(xyz.copy(), passes=3, frac=0.2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


TRICKY_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<WhiteboardCaptureSession>
  <WhiteboardDescription>
    <SensorLocation corner="top_left"/>
    <DiagonallyOppositeCoords x="6512" y="1376"/>
  </WhiteboardDescription>
  <!-- a comment mentioning <Point x="1" y="2"/> that must be ignored -->
  <StrokeSet>
    <Stroke colour='black' start_time="100.0">
      <Point x="100" y="200" time="100.00"/>
      <Point y="205" x="110"/>
      <Point x=" 120 " y='210'></Point>
    </Stroke>
    <!-- empty stroke -->
    <Stroke/>
    <Stroke>
      <Point x="150" y="220"/>
      <Point x="160" y="225"/>
      <Point x="-3" y="12"/>
    </Stroke>
  </StrokeSet>
</WhiteboardCaptureSession>
"""


def _et_reference_parse(path):
    """The ElementTree path of parse_strokes_xml, pre-simplify (the numpy
    reference the native scanner must match)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    xs, ys, ends = [], [], []
    for stroke in root.find("StrokeSet").findall("Stroke"):
        points = stroke.findall("Point")
        for idx, p in enumerate(points):
            xs.append(int(p.attrib["x"]))
            ys.append(int(p.attrib["y"]))
            ends.append(1.0 if idx == len(points) - 1 else 0.0)
    xs, ys, ends = (np.asarray(a, dtype=np.float64) for a in (xs, ys, ends))
    strokes = np.stack([xs[1:] - xs[:-1], -(ys[1:] - ys[:-1]), ends[1:]], axis=1)
    strokes[:, 2] = np.roll(strokes[:, 2], 1)
    strokes[:, :2] /= np.std(strokes[:, :2])
    return strokes


def test_xml_parse_matches_elementtree(tmp_path):
    """Native scanner == ElementTree on IAM-shaped XML with comments,
    attribute-order/quote variants, extra attributes, non-self-closing
    Points, empty strokes, and coordinate-bearing tags outside StrokeSet."""
    from dhg.native import parse_strokes_xml_native

    p = tmp_path / "tricky.xml"
    p.write_text(TRICKY_XML)
    ref = _et_reference_parse(p)
    out = parse_strokes_xml_native(p)  # parse-only
    assert out is not None and out.shape == ref.shape == (5, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)
    assert out[0, 2] == 1.0  # rolled pen bit: last point's end lands at row 0


def test_xml_parse_and_simplify_matches_python_pipeline(tmp_path):
    from dhg.data.strokes import combine_strokes
    from dhg.native import parse_strokes_xml_native

    # Long synthetic line so all 3 combine passes do real work.
    rng = np.random.RandomState(7)
    pts, x, y = [], 500, 800
    for s in range(12):
        body = "".join(
            f'<Point x="{(x := x + int(d))}" y="{(y := y + int(e))}"/>'
            for d, e in rng.randint(-40, 40, size=(30, 2))
        )
        pts.append(f"<Stroke>{body}</Stroke>")
    p = tmp_path / "long.xml"
    p.write_text(f"<W><StrokeSet>{''.join(pts)}</StrokeSet></W>")

    ref = _et_reference_parse(p)
    for _ in range(3):
        ref = combine_strokes(ref, int(len(ref) * 0.2))
    out = parse_strokes_xml_native(p, passes=3, frac=0.2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_xml_parse_declines_surprises(tmp_path):
    """Anything the targeted scanner can't guarantee -> None (fallback)."""
    from dhg.native import parse_strokes_xml_native

    two_pts = '<Point x="1" y="2"/><Point x="3" y="4"/>'
    cases = {
        "no_strokeset.xml": "<W><Other/></W>",
        "bad_coord.xml": '<W><StrokeSet><Stroke><Point x="1e3" y="2"/>'
        '<Point x="3" y="4"/></Stroke></StrokeSet></W>',
        "unterminated.xml": '<W><StrokeSet><Stroke><Point x="1" y="2"/>',
        "one_point.xml": '<W><StrokeSet><Stroke><Point x="1" y="2"/>'
        "</Stroke></StrokeSet></W>",
        # ElementTree's findall only sees DIRECT children — nested or
        # misplaced Stroke/Point/StrokeSet must decline, not diverge:
        "nested_point.xml": f"<W><StrokeSet><Stroke><Foo>{two_pts}</Foo>"
        f"{two_pts}</Stroke></StrokeSet></W>",
        "wrapped_stroke.xml": f"<W><StrokeSet><G><Stroke>{two_pts}</Stroke>"
        "</G></StrokeSet></W>",
        "nested_stroke.xml": f"<W><StrokeSet><Stroke><Stroke>{two_pts}"
        f"</Stroke>{two_pts}</Stroke></StrokeSet></W>",
        "point_outside_stroke.xml": f"<W><StrokeSet>{two_pts}</StrokeSet></W>",
        "deep_strokeset.xml": f"<W><G><StrokeSet><Stroke>{two_pts}"
        "</Stroke></StrokeSet></G></W>",
        "root_strokeset.xml": f"<StrokeSet><Stroke>{two_pts}</Stroke></StrokeSet>",
        # Malformed XML ElementTree rejects with ParseError must decline:
        "unbalanced.xml": f"<W><StrokeSet><Stroke>{two_pts}</StrokeSet></W>",
        "mismatched.xml": f"<W><StrokeSet><Stroke>{two_pts}</Stroke>"
        "</StrokeZet></W>",
        "dup_attr.xml": '<W><StrokeSet><Stroke><Point x="1" x="9" y="2"/>'
        '<Point x="3" y="4"/></Stroke></StrokeSet></W>',
        "two_roots.xml": f"<W><StrokeSet><Stroke>{two_pts}</Stroke>"
        "</StrokeSet></W><W2/>",
        "junk_after_root.xml": f"<W><StrokeSet><Stroke>{two_pts}</Stroke>"
        "</StrokeSet></W><Point x=\"9\" y=\"9\"/>",
        "second_strokeset.xml": f"<W><StrokeSet><Stroke>{two_pts}</Stroke>"
        f"</StrokeSet><StrokeSet><Stroke>{two_pts}</Stroke></StrokeSet></W>",
    }
    for name, body in cases.items():
        p = tmp_path / name
        p.write_text(body)
        assert parse_strokes_xml_native(p) is None, name


def test_xml_parse_degenerate_std_matches_numpy(tmp_path):
    """Two identical points -> zero deltas -> np.std == 0 -> the reference
    path divides anyway (0/0 = NaN). The native path must produce the same
    rows, so cache contents can't depend on whether the library built."""
    from dhg.native import parse_strokes_xml_native

    p = tmp_path / "degenerate.xml"
    p.write_text(
        '<W><StrokeSet><Stroke><Point x="5" y="5"/><Point x="5" y="5"/>'
        "</Stroke></StrokeSet></W>"
    )
    out = parse_strokes_xml_native(p)
    with np.errstate(invalid="ignore"):
        ref = _et_reference_parse(p)
    assert out.shape == ref.shape == (1, 3)
    np.testing.assert_array_equal(np.isnan(out), np.isnan(ref))
    assert out[0, 2] == ref[0, 2] == 1.0  # pen bit unaffected


def test_public_parse_falls_back_on_decline(tmp_path):
    """parse_strokes_xml still raises the reference's error shape when the
    native scanner declines and ElementTree also finds no StrokeSet."""
    from dhg.data.strokes import parse_strokes_xml

    p = tmp_path / "no_ss.xml"
    p.write_text("<W><Other/></W>")
    with pytest.raises(ValueError, match="no StrokeSet"):
        parse_strokes_xml(p)


def test_pen_bits_preserved():
    xyz = np.zeros((10, 3))
    xyz[:, 0] = 1.0  # all collinear
    xyz[3, 2] = 1.0
    out = simplify_strokes_native(xyz, passes=1, frac=0.3)
    ref = combine_strokes(xyz.copy(), 3)
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    assert set(np.unique(out[:, 2])) <= {0.0, 1.0}

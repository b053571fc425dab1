"""Paragraph mode: wrap_text splitting + compose_lines page assembly.

Capability superset of the reference, which renders exactly one line of at
most max_text_len-1 chars (utils/vis.py:5-36, dataset cap dataset.py:80).
The exactness contract under test: a composed page draws exactly the union
of the per-line solo renderings, translated into line slots — the
connecting pen moves between lines are never drawn.
"""

import numpy as np
import pytest

from dhg.inference import wrap_text
from dhg.utils.vis import compose_lines, drawn_segments


# ---------------------------------------------------------------- wrap_text


def test_wrap_basic_word_boundaries():
    lines = wrap_text("the quick brown fox jumps over the lazy dog", 15)
    assert all(len(ln) <= 15 for ln in lines)
    assert " ".join(lines) == "the quick brown fox jumps over the lazy dog"


def test_wrap_long_word_hard_split():
    lines = wrap_text("a " + "x" * 30 + " b", 10)
    assert all(len(ln) <= 10 for ln in lines)
    assert "".join(lines).replace(" ", "") == "a" + "x" * 30 + "b".replace(" ", "")


def test_wrap_newlines_force_breaks_and_blank_lines_survive():
    lines = wrap_text("first\n\nsecond paragraph", 50)
    assert lines == ["first", "", "second paragraph"]


def test_wrap_collapses_interword_whitespace_at_breaks():
    lines = wrap_text("aa   bb", 4)
    assert lines == ["aa", "bb"]


def test_wrap_empty_and_invalid():
    assert wrap_text("", 10) == [""]
    with pytest.raises(ValueError):
        wrap_text("hi", 0)


# ------------------------------------------------------------ compose_lines


def segset(seq):
    """Canonical set of drawn segments: frozenset of rounded endpoint pairs."""
    xy, draw = drawn_segments(seq)
    out = set()
    for i in np.flatnonzero(draw):
        a = tuple(np.round(xy[i], 6))
        b = tuple(np.round(xy[i + 1], 6))
        out.add((a, b))
    return out


def make_line(deltas_pen):
    return np.asarray(deltas_pen, dtype=float)


LINE_A = make_line(
    [
        [1.0, 0.5, 0],
        [1.0, -0.5, 0],
        [0.5, 0.0, 1],  # pen-up: segment into this point is skipped
        [1.0, 1.0, 0],
        [1.0, -1.0, 1],  # last pen-up: nothing after is drawn
        [5.0, 5.0, 0],  # trailing undrawn ink (solo quirk)
    ]
)
LINE_B = make_line(
    [
        [0.3, 0.2, 0],
        [2.0, 0.0, 0],
        [0.0, 1.0, 0],
        [1.0, 0.0, 1],
    ]
)


def translate_segs(segs, t):
    return {
        (tuple(np.round(np.array(a) + t, 6)), tuple(np.round(np.array(b) + t, 6)))
        for a, b in segs
    }


def solo_translation(seq, slot, pitch, align="left", page_w=None):
    """Where compose_lines puts this line: left-align drawn ink at x=0,
    ink top at y = -slot * pitch."""
    xy, draw = drawn_segments(seq)
    pts = np.concatenate([xy[:-1][draw], xy[1:][draw]], axis=0)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    tx = -lo[0]
    if align == "center":
        tx += 0.5 * (page_w - (hi[0] - lo[0]))
    return np.array([tx, -(slot * pitch) - hi[1]])


def test_compose_draws_exactly_the_union_of_solo_renderings():
    pitch = 4.0
    page = compose_lines([LINE_A, LINE_B], line_gap=pitch)
    expected = translate_segs(
        segset(LINE_A), solo_translation(LINE_A, 0, pitch)
    ) | translate_segs(segset(LINE_B), solo_translation(LINE_B, 1, pitch))
    assert segset(page) == expected
    # In particular: the trailing undrawn ink of LINE_A stays undrawn, and
    # no connecting segment between the two lines appears.
    assert len(segset(page)) == len(segset(LINE_A)) + len(segset(LINE_B))


def test_compose_single_line_is_solo_rendering_translated():
    pitch = 10.0
    page = compose_lines([LINE_B], line_gap=pitch)
    assert segset(page) == translate_segs(segset(LINE_B), solo_translation(LINE_B, 0, pitch))


def test_compose_blank_slot_leaves_vertical_gap():
    pitch = 4.0
    two = compose_lines([LINE_B, LINE_B], line_gap=pitch)
    gapped = compose_lines([LINE_B, None, LINE_B], line_gap=pitch)
    ys_two = sorted({p[1] for seg in segset(two) for p in seg})
    ys_gap = sorted({p[1] for seg in segset(gapped) for p in seg})
    # Second copy sits one extra pitch lower when a blank line intervenes.
    assert np.allclose(np.array(ys_gap) - np.array(ys_two) != 0,
                       np.array(ys_gap) < np.array(ys_two))
    assert min(ys_gap) == pytest.approx(min(ys_two) - pitch)


def test_compose_center_alignment():
    pitch = 4.0
    page = compose_lines([LINE_A, LINE_B], line_gap=pitch, align="center")
    widths = []
    for seq in (LINE_A, LINE_B):
        xy, draw = drawn_segments(seq)
        pts = np.concatenate([xy[:-1][draw], xy[1:][draw]], axis=0)
        widths.append(pts[:, 0].max() - pts[:, 0].min())
    page_w = max(widths)
    expected = translate_segs(
        segset(LINE_A), solo_translation(LINE_A, 0, pitch, "center", page_w)
    ) | translate_segs(segset(LINE_B), solo_translation(LINE_B, 1, pitch, "center", page_w))
    assert segset(page) == expected


def test_compose_default_gap_scales_with_tallest_line():
    page = compose_lines([LINE_A, LINE_B])
    ys = [p[1] for seg in segset(page) for p in seg]
    # Two non-overlapping bands: line B's top must sit below line A's bottom.
    xy, draw = drawn_segments(LINE_A)
    pts = np.concatenate([xy[:-1][draw], xy[1:][draw]], axis=0)
    h_a = pts[:, 1].max() - pts[:, 1].min()
    assert min(ys) < -h_a  # second line fully below the first

def test_compose_no_ink_returns_renderable_noop():
    page = compose_lines([None, np.zeros((4, 3))])
    assert page.shape == (1, 3)
    assert segset(page) == set()


def test_compose_rejects_unknown_align():
    with pytest.raises(ValueError):
        compose_lines([LINE_A], align="justify")

"""Property-based tests (hypothesis) for the fiddly pure-numpy data path.

These functions carry the reference's subtlest behavior contracts
(SURVEY §2 dataset quirks), so fixed-example tests are complemented here
with randomized invariants: tokenizer encode/decode/batch agreement,
combine_strokes structural invariants + numpy-vs-C++ bit-identity, the
pad/drop rules, and the strided schedule's exact-alpha-subset guarantee.
Example counts are kept modest so the suite stays fast.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dhg.data.strokes import combine_strokes, pad_stroke_seq
from dhg.data.tokenizer import CHARSET, EOS_ID, UNK_ID, Tokenizer

SETTINGS = dict(max_examples=40, deadline=None)


# -- tokenizer ----------------------------------------------------------------


@settings(**SETTINGS)
@given(st.text(alphabet=CHARSET, max_size=48))
def test_tokenizer_roundtrip_on_charset(text):
    tok = Tokenizer()
    ids = tok.encode(text)
    assert ids[-1] == EOS_ID
    assert all(2 <= i <= tok.vocab_size - 1 for i in ids[:-1])
    assert tok.decode(ids[:-1]) == text


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=20), min_size=1, max_size=5))
def test_encode_batch_matches_encode_for_any_unicode(texts):
    """The vectorized batch path agrees with scalar encode() on ARBITRARY
    strings — unknown codepoints (incl. astral-plane) all map to UNK."""
    tok = Tokenizer()
    max_len = 22
    batch = tok.encode_batch(texts, max_len)
    for row, t in zip(batch, texts):
        ids = tok.encode(t)
        assert list(row[: len(ids)]) == ids
        assert not row[len(ids) :].any()  # zero padding after EOS


@settings(**SETTINGS)
@given(st.text(max_size=48))
def test_encode_unknowns_map_to_unk(text):
    tok = Tokenizer()
    for c, i in zip(text, tok.encode(text)):
        assert i == (tok.tokens[c] if c in tok.tokens else UNK_ID)


# -- stroke simplification ------------------------------------------------------


def _strokes(n, seed, pen_p=0.1):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(n, 3)
    xyz[:, 2] = (rng.rand(n) < pen_p).astype(float)
    xyz[:, :2] /= np.std(xyz[:, :2])
    return xyz


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=4, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    frac=st.floats(min_value=0.05, max_value=0.5),
)
def test_combine_strokes_invariants(n, seed, frac):
    """Length drops by exactly the merge count, pen bits stay binary, and
    the surviving deltas are re-normalized to unit std (utils/io.py:118-147
    semantics)."""
    xyz = _strokes(n, seed)
    k = max(1, int(n // 2 * frac))
    out = combine_strokes(xyz.copy(), k)
    assert out.shape == (n - k, 3)
    assert set(np.unique(out[:, 2])) <= {0.0, 1.0}
    assert np.isclose(np.std(out[:, :2]), 1.0, rtol=1e-9)
    # Merging sums pairs, so the TOTAL displacement is preserved exactly up
    # to the final global re-normalization: after == before / std_factor.
    before = xyz[:, :2].sum(0)
    after = out[:, :2].sum(0)
    scale = np.linalg.norm(after) / max(np.linalg.norm(before), 1e-12)
    np.testing.assert_allclose(after, before * scale, rtol=1e-6, atol=1e-6)


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=4, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    frac=st.floats(min_value=0.05, max_value=0.45),
)
def test_native_combine_bit_identical_to_numpy(n, seed, frac):
    """The C++ path must agree with numpy on ARBITRARY inputs, not just the
    fixed seeds in test_native.py — stable tie ordering is the contract."""
    from dhg.native import combine_strokes_native, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    xyz = _strokes(n, seed)
    k = int(n // 2 * frac)
    ref = combine_strokes(xyz.copy(), k)
    out = combine_strokes_native(xyz.copy(), k)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-14)


@settings(**SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=64),
    maxlength=st.integers(min_value=1, max_value=64),
    big=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pad_stroke_seq_contract(n, maxlength, big, seed):
    """None iff too long or any |coord| > 15; else [max, 3] f32 with
    (0,0,1) padding rows (utils/preprocessing.py:4-26)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 3) * 2.0
    x[:, 2] = (x[:, 2] > 0).astype(float)
    if big:
        x[rng.randint(n), rng.randint(2)] = 15.0001
    out = pad_stroke_seq(x, maxlength)
    if n > maxlength or np.amax(np.abs(x)) > 15:
        assert out is None
    else:
        assert out is not None and out.shape == (maxlength, 3)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out[:n], x.astype(np.float32), rtol=1e-6)
        assert not out[n:, :2].any()
        assert (out[n:, 2] == 1.0).all()


# -- schedules ------------------------------------------------------------------


@pytest.mark.parametrize("k", [2, 3, 5, 10, 15, 20, 30, 59, 60])
def test_strided_alphas_are_exact_subset(k):
    """cumprod(1-strided_beta_set(k)) must hit k of the 60 canonical
    alpha_bar levels EXACTLY (including the final one), so a k-step walk
    denoises on true schedule points."""
    from dhg.core.schedule import get_alpha_set, get_beta_set, strided_beta_set

    full = np.asarray(get_alpha_set(get_beta_set()), np.float64)
    strided = np.asarray(get_alpha_set(strided_beta_set(k)), np.float64)
    assert strided.shape == (k,)
    # Every strided level matches some canonical level to f32 resolution
    # (the beta construction is exact in real arithmetic; recomputing
    # cumprod(1 - beta) in f32 reintroduces ~1e-7 relative rounding).
    dist = np.abs(strided[:, None] - full[None, :]).min(axis=1)
    assert dist.max() <= 1e-6, dist.max()
    np.testing.assert_allclose(strided[-1], full[-1], rtol=1e-5)
    assert (np.diff(strided) < 0).all()  # strictly decreasing noise level


# -- config merge / override semantics -------------------------------------------

_keys = st.sampled_from(list("abcdef"))
_scalars = st.one_of(st.integers(-100, 100), st.floats(allow_nan=False, allow_infinity=False, width=32), st.text(max_size=6), st.booleans(), st.none())
_nested = st.recursive(
    st.dictionaries(_keys, _scalars, max_size=3),
    lambda children: st.dictionaries(_keys, st.one_of(_scalars, children), max_size=3),
    max_leaves=12,
)


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, p + "."))
        else:
            out[p] = v
    return out


@settings(**SETTINGS)
@given(base=_nested, over=_nested)
def test_merge_configs_is_deep(base, over):
    """merge semantics (reference config.py:57-69): every leaf of `over`
    wins at its full dotted path; base leaves not shadowed by an `over`
    leaf or dict-over-scalar replacement survive."""
    import copy

    from dhg.config import merge_configs

    merged = merge_configs(copy.deepcopy(base), copy.deepcopy(over))
    flat_m = _flatten(merged)
    for path, v in _flatten(over).items():
        assert path in flat_m and flat_m[path] == v or (
            flat_m.get(path) is v
        ), path
    # A base leaf at `path` survives the DEEP merge unless `over` destroys
    # it: an over LEAF at `path`, at an ancestor (scalar replaces the
    # subtree), or at a descendant (dicts materialize over the scalar) —
    # or an over DICT node at `path` or below (dict-wins replaces the
    # scalar, even when empty: over={'a': {}} kills base={'a': 1}).
    # An over dict at a strict ANCESTOR recurses and preserves siblings —
    # that is the deep-merge property this test pins.
    def _node_paths(d, prefix=""):
        out = set()
        for k, v in d.items():
            p = f"{prefix}{k}"
            if isinstance(v, dict):
                out.add(p)
                out |= _node_paths(v, p + ".")
        return out

    over_leaves = set(_flatten(over))
    over_dicts = _node_paths(over)
    for path, v in _flatten(base).items():
        shadowed = any(
            q == path or p.startswith(q + ".") or q.startswith(path + ".")
            for q in over_leaves
            for p in [path]
        ) or any(d == path or d.startswith(path + ".") for d in over_dicts)
        if not shadowed:
            assert path in flat_m and (flat_m[path] == v or flat_m[path] is v), path


@settings(**SETTINGS)
@given(
    base=_nested,
    path=st.lists(_keys, min_size=1, max_size=4),
    value=_scalars,
)
def test_update_config_sets_exact_dotted_path(base, path, value):
    """Dotted overrides (reference config.py:72-86) set exactly the named
    leaf, materializing intermediate dicts over any scalar in the way."""
    import copy

    from dhg.config import update_config

    dotted = ".".join(path)
    out = update_config(copy.deepcopy(base), {dotted: value})
    node = out
    for p in path[:-1]:
        assert isinstance(node[p], dict)
        node = node[p]
    assert node[path[-1]] == value or node[path[-1]] is value


# -- native XML scanner vs ElementTree (differential fuzz) ---------------------


@st.composite
def iam_like_xml(draw):
    """Random IAM-shaped stroke XML: varied whitespace, quote styles,
    attribute order, extra attributes, comments, declarations, empty and
    non-self-closing elements — everything the targeted scanner claims to
    handle. Always well-formed with the StrokeSet a direct child of the
    root, i.e. inputs where the scanner must PARSE (and match ET exactly),
    not decline."""
    rng_ws = st.sampled_from(["", " ", "  ", "\n", "\n  "])
    n_strokes = draw(st.integers(1, 4))
    decl = draw(st.booleans())
    comment = draw(st.booleans())
    parts = []
    if decl:
        parts.append('<?xml version="1.0" encoding="ISO-8859-1"?>')
    parts.append("<WhiteboardCaptureSession>")
    if comment:
        parts.append('<!-- a comment with <Point x="1" y="2"/> inside -->')
    if draw(st.booleans()):
        parts.append(
            '<WhiteboardDescription><SensorLocation corner="top_left"/>'
            '<DiagonallyOppositeCoords x="6512" y="1376"/>'
            "</WhiteboardDescription>"
        )
    parts.append("<StrokeSet>")
    total = 0
    for _ in range(n_strokes):
        n_pts = draw(st.integers(0, 5))
        total += n_pts
        stroke_attr = draw(st.sampled_from(["", ' colour="black"', " start_time='1.0'"]))
        if n_pts == 0 and draw(st.booleans()):
            parts.append(f"<Stroke{stroke_attr}/>")
            continue
        parts.append(f"<Stroke{stroke_attr}>")
        for _ in range(n_pts):
            x = draw(st.integers(-9999, 9999))
            y = draw(st.integers(-9999, 9999))
            q1, q2 = draw(st.sampled_from(['""', "''", '"\'', '\'"']))
            ws = draw(rng_ws)
            extra = draw(st.sampled_from(["", ' time="0.01"']))
            a = f"x={q1}{x}{q1}"
            b = f"y={q2}{y}{q2}"
            if draw(st.booleans()):
                a, b = b, a
            body = f"<Point {a} {ws}{b}{extra}"
            parts.append(body + ("/>" if draw(st.booleans()) else "></Point>"))
        parts.append("</Stroke>")
    parts.append(draw(rng_ws))
    parts.append("</StrokeSet></WhiteboardCaptureSession>")
    return "".join(parts), total


@settings(max_examples=60, deadline=None)
@given(iam_like_xml())
def test_native_scanner_matches_elementtree_fuzz(tmp_path_factory, case):
    """On every well-formed IAM-shaped file the native scanner either
    declines (None -> ET fallback, always safe) or produces EXACTLY the
    ElementTree reference's pre-simplify rows. It must never parse
    successfully with different values — that is the whole contract."""
    import xml.etree.ElementTree as ET

    from dhg.native import get_lib, parse_strokes_xml_native

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    xml, total = case
    p = tmp_path_factory.mktemp("fuzz") / "f.xml"
    p.write_text(xml)

    out = parse_strokes_xml_native(p)  # parse-only

    # ET reference (pre-simplify stage of parse_strokes_xml).
    root = ET.parse(p).getroot()
    xs, ys, ends = [], [], []
    for stroke in root.find("StrokeSet").findall("Stroke"):
        points = stroke.findall("Point")
        for idx, pt in enumerate(points):
            xs.append(int(pt.attrib["x"]))
            ys.append(int(pt.attrib["y"]))
            ends.append(1.0 if idx == len(points) - 1 else 0.0)
    assert len(xs) == total
    if total < 2:
        assert out is None  # <2 points: scanner must decline
        return
    xs, ys, ends = (np.asarray(a, dtype=np.float64) for a in (xs, ys, ends))
    ref = np.stack([xs[1:] - xs[:-1], -(ys[1:] - ys[:-1]), ends[1:]], axis=1)
    ref[:, 2] = np.roll(ref[:, 2], 1)
    with np.errstate(invalid="ignore"):
        ref[:, :2] /= np.std(ref[:, :2])

    assert out is not None, "scanner declined a plain well-formed IAM file"
    assert out.shape == ref.shape
    both_nan = np.isnan(ref) & np.isnan(out)
    np.testing.assert_allclose(
        np.where(both_nan, 0.0, out), np.where(both_nan, 0.0, ref),
        rtol=1e-10, atol=1e-12,
    )

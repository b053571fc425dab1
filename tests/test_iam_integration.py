"""Full offline IAM pipeline over a crafted miniature IAM directory tree.

Builds real files (stroke XML, ascii transcription, TIFF line images) in the
reference's on-disk layout and runs build_iam_cache end-to-end, including
batched style extraction (random-init MobileNetV2 trunk).
"""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dhg.data.iam import IAMDataset, build_iam_cache, load_or_build_cache


def _stroke_xml(points_per_stroke, start=(100, 200), step=8):
    """XML with the IAM structure; coordinates walk right with small jitter."""
    rng = np.random.RandomState(0)
    x, y = start
    strokes = []
    for n in points_per_stroke:
        pts = []
        for _ in range(n):
            x += step + int(rng.randint(-2, 3))
            y += int(rng.randint(-3, 4))
            pts.append(f'<Point x="{x}" y="{y}" time="0"/>')
        strokes.append("<Stroke>" + "".join(pts) + "</Stroke>")
    return (
        "<WhiteboardCaptureSession><StrokeSet>"
        + "".join(strokes)
        + "</StrokeSet></WhiteboardCaptureSession>"
    )


def _line_image(width=420, height=140, seed=0):
    img = np.full((height, width), 255, np.uint8)
    rng = np.random.RandomState(seed)
    xs = np.linspace(15, width - 15, 300).astype(int)
    ys = (height // 2 + 25 * np.sin(xs / 17.0) + rng.randn(300) * 2).astype(int)
    img[np.clip(ys, 2, height - 3), xs] = 0
    return img


@pytest.fixture(scope="module")
def iam_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("iam")
    form = "a01-000u"
    d1, d2 = form[:3], form[:7]
    (root / "ascii" / d1 / d2).mkdir(parents=True)
    (root / "lineStrokes" / d1 / d2).mkdir(parents=True)
    (root / "lineImages" / d1 / d2).mkdir(parents=True)

    texts = ["A first line", "And another one", "Third text here"]
    ascii_body = "OCR:\n\nx\n\nCSR:\n\n" + "\n".join(texts) + "\n"
    (root / "ascii" / d1 / d2 / f"{form}.txt").write_text(ascii_body)

    for i in range(1, 4):
        sid = f"{form}-{i:02d}"
        (root / "lineStrokes" / d1 / d2 / f"{sid}.xml").write_text(
            _stroke_xml([30, 40, 25], step=6 + i)
        )
        cv2.imwrite(
            str(root / "lineImages" / d1 / d2 / f"{sid}.tif"), _line_image(seed=i)
        )

    splits = root / "splits.json"
    splits.write_text(json.dumps({"train": [form], "validation": []}))
    return root, splits


def test_build_cache_end_to_end(iam_tree):
    root, splits = iam_tree
    cache = build_iam_cache(
        data_dir=root,
        kind="train",
        splits_file=splits,
        img_height=96,
        img_width=1400,
        max_text_len=50,
        max_seq_len=480,
        seed=54321,
    )
    assert len(cache) == 3
    assert cache.strokes.shape == (3, 480, 3)
    assert cache.text.shape == (3, 50)
    assert cache.style.shape == (3, 14, 1280)
    assert cache.strokes.dtype == np.float32
    assert np.all(np.isfinite(cache.strokes))
    assert np.all(np.isfinite(cache.style))
    # Padded stroke tails are (0, 0, 1).
    assert np.all(cache.strokes[:, -1, 2] == 1.0)
    # Texts decoded back match the transcription.
    from dhg.data.tokenizer import Tokenizer

    tok = Tokenizer()
    decoded = tok.decode(cache.text[0][cache.text[0] > 1])
    assert decoded == "A first line"


def test_cache_roundtrip_and_dataset_view(iam_tree, tmp_path):
    root, splits = iam_tree
    kwargs = dict(
        data_dir=root,
        kind="train",
        splits_file=splits,
        img_height=96,
        img_width=1400,
        max_text_len=50,
        max_seq_len=480,
        seed=54321,
    )
    c1 = load_or_build_cache(cache_dir=tmp_path, **kwargs)
    c2 = load_or_build_cache(cache_dir=tmp_path, **kwargs)  # hits the file
    np.testing.assert_allclose(c1.strokes, c2.strokes)
    np.testing.assert_allclose(c1.style, c2.style)

    ds = IAMDataset(cache=c1)
    assert len(ds) == 3
    item = ds[0]
    assert set(item) == {"strokes", "text", "style"}
    assert item["strokes"].shape == (480, 3)


@pytest.fixture(scope="module")
def iam_tree_multiform(tmp_path_factory):
    """Six forms x 3 lines — enough forms for the thread pool to matter."""
    root = tmp_path_factory.mktemp("iam_multi")
    forms = [f"a{k:02d}-000u" for k in range(1, 7)]
    texts = ["A first line", "And another one", "Third text here"]
    for fi, form in enumerate(forms):
        d1, d2 = form[:3], form[:7]
        (root / "ascii" / d1 / d2).mkdir(parents=True)
        (root / "lineStrokes" / d1 / d2).mkdir(parents=True)
        (root / "lineImages" / d1 / d2).mkdir(parents=True)
        ascii_body = "OCR:\n\nx\n\nCSR:\n\n" + "\n".join(texts) + "\n"
        (root / "ascii" / d1 / d2 / f"{form}.txt").write_text(ascii_body)
        for i in range(1, 4):
            sid = f"{form}-{i:02d}"
            (root / "lineStrokes" / d1 / d2 / f"{sid}.xml").write_text(
                _stroke_xml([30, 40, 25], step=5 + ((fi + i) % 4))
            )
            cv2.imwrite(
                str(root / "lineImages" / d1 / d2 / f"{sid}.tif"),
                _line_image(seed=10 * fi + i),
            )
    splits = root / "splits.json"
    splits.write_text(json.dumps({"train": forms, "validation": []}))
    return root, splits


def test_parallel_build_identical(iam_tree_multiform):
    """The thread-pool build must produce EXACTLY the serial cache — same
    samples, same order, same per-form style-source draws — for any worker
    count, including with max_files truncation."""
    root, splits = iam_tree_multiform
    kwargs = dict(
        data_dir=root,
        kind="train",
        splits_file=splits,
        img_height=96,
        img_width=1400,
        max_text_len=50,
        max_seq_len=480,
        seed=54321,
    )
    serial = build_iam_cache(workers=1, **kwargs)
    parallel = build_iam_cache(workers=4, **kwargs)
    assert serial.sample_ids == parallel.sample_ids and len(serial) == 18
    np.testing.assert_array_equal(serial.strokes, parallel.strokes)
    np.testing.assert_array_equal(serial.text, parallel.text)
    np.testing.assert_array_equal(serial.style, parallel.style)

    s_trunc = build_iam_cache(workers=1, max_files=7, **kwargs)
    p_trunc = build_iam_cache(workers=4, max_files=7, **kwargs)
    assert s_trunc.sample_ids == p_trunc.sample_ids == serial.sample_ids[:7]
    np.testing.assert_array_equal(s_trunc.strokes, p_trunc.strokes)


def test_style_source_differs_from_sample(iam_tree):
    """Style vectors come from a DIFFERENT line of the same form: with 3
    distinct line images, at least one sample's style must differ from the
    style computed on its own image."""
    root, splits = iam_tree
    cache = build_iam_cache(
        data_dir=root,
        kind="train",
        splits_file=splits,
        img_height=96,
        img_width=1400,
        max_text_len=50,
        max_seq_len=480,
        seed=54321,
    )
    # All three style vectors should not be identical (different sources).
    assert not (
        np.allclose(cache.style[0], cache.style[1])
        and np.allclose(cache.style[1], cache.style[2])
    )

def test_extract_style_vectors_buckets_wide_widths():
    """Wider-than-common style images are grouped into width BUCKETS
    (cv2 resize to the nearest multiple of width_bucket) instead of one
    XLA program per distinct natural width — at real scale (~240 distinct
    wide widths in the 12k-line dress rehearsal) per-width compiles over
    the remote tunnel would cost hours. width_bucket=0 keeps the exact
    natural-width path."""
    from dhg.data.iam import extract_style_vectors

    shapes_seen = []

    def stub_apply(b):
        b = np.asarray(b)
        shapes_seen.append(b.shape)
        # Encode the input width into the output so slot placement and
        # resize targets are both checkable.
        v = np.zeros((b.shape[0], 14, 1280), np.float32)
        v[:, 0, 0] = b.shape[2]
        v[:, 0, 1] = b.mean(axis=(1, 2))
        return v

    imgs = (
        [np.full((96, 1400), float(40 + i), np.float32) for i in range(5)]  # common
        + [
            np.full((96, 1433), 1.0, np.float32),
            np.full((96, 1471), 2.0, np.float32),
            np.full((96, 1490), 3.0, np.float32),
        ]
    )
    out = extract_style_vectors(imgs, stub_apply, batch=4, width_bucket=64)
    assert out.shape == (8, 14, 1280)
    # Common batch ran at 1400; wide images bucketed to 64-multiples:
    # 1433 -> 1408, 1471/1490 -> 1472 (one shared program).
    widths = sorted(s[2] for s in shapes_seen)
    assert widths == [1400, 1400, 1408, 1472]
    # Slot placement survives grouping (mean encodes the source image).
    assert [round(float(out[i, 0, 1])) for i in range(5)] == [40, 41, 42, 43, 44]
    assert round(float(out[5, 0, 1])) == 1
    assert round(float(out[6, 0, 1])) == 2
    assert round(float(out[7, 0, 1])) == 3
    assert float(out[5, 0, 0]) == 1408.0
    assert float(out[6, 0, 0]) == 1472.0 == float(out[7, 0, 0])

    # Exact mode: every wide image runs at its own natural width.
    shapes_seen.clear()
    out0 = extract_style_vectors(imgs, stub_apply, batch=4, width_bucket=0)
    widths0 = sorted(s[2] for s in shapes_seen)
    assert widths0 == [1400, 1400, 1433, 1471, 1490]
    assert float(out0[5, 0, 0]) == 1433.0

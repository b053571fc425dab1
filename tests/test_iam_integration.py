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
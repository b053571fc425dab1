"""IAM-OnDB dataset build with a packed .npz cache.

Re-designs the reference IAMDataset (dataset.py:22-157) for TPU training:
instead of an eager in-RAM torch Dataset whose __init__ runs MobileNetV2 per
sample, the build is a one-shot offline pass that emits a packed cache of
fixed-shape arrays:

  strokes  f32[N, max_seq_len, 3]
  text     i32[N, max_text_len]
  style    f32[N, 14, 1280]

Training then samples i.i.d. random batches straight from the cache (the
reference's `next(iter(loader))`-per-step draws a fresh shuffled batch every
step anyway, train.py:98 — sampling with replacement from the packed cache
matches that effective behavior and is far faster).

Filtering parity with the reference build (dataset.py:62-150):
  * text filter: len(text) >= max_text_len drops the line (<= 49 chars + EOS);
  * stroke filter: sequences longer than max_seq_len or with any |coord| > 15
    are dropped (pad_stroke_seq -> None);
  * image filter: lines whose trimmed image is >= img_width px wide are
    dropped (the reference only appends inside `if img.shape[1] < img_width`);
  * style source: a random DIFFERENT line of the same form (writer), so the
    style vector cannot leak the target text (dataset.py:110-118). The
    reference uses an unseeded random.choice; here the choice is derived from
    `seed` for reproducibility (documented divergence).

Style vectors are computed in batches on the accelerator via the frozen
StyleExtractor instead of per-sample on CPU.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import zlib
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from itertools import islice
from pathlib import Path

import numpy as np

from dhg.data.images import pad_img, read_img
from dhg.data.strokes import pad_stroke_seq, parse_lines_txt, parse_strokes_xml
from dhg.data.tokenizer import Tokenizer

logger = logging.getLogger(__name__)


@dataclass
class IAMCache:
    """Packed dataset arrays ready for device upload."""

    strokes: np.ndarray  # f32 [N, max_seq_len, 3]
    text: np.ndarray  # i32 [N, max_text_len]
    style: np.ndarray  # f32 [N, 14, 1280]
    sample_ids: list[str]

    def __len__(self) -> int:
        return len(self.sample_ids)

    def save(self, path: Path | str) -> None:
        np.savez_compressed(
            path,
            strokes=self.strokes,
            text=self.text,
            style=self.style,
            sample_ids=np.array(self.sample_ids),
        )

    @classmethod
    def load(cls, path: Path | str) -> "IAMCache":
        z = np.load(path, allow_pickle=False)
        return cls(
            strokes=z["strokes"],
            text=z["text"],
            style=z["style"],
            sample_ids=[str(s) for s in z["sample_ids"]],
        )


def _build_form(
    form: str,
    data_dir: Path,
    img_height: int,
    img_width: int,
    max_text_len: int,
    max_seq_len: int,
    seed: int,
    tokenizer: Tokenizer,
) -> list[tuple[str, np.ndarray, np.ndarray, np.ndarray]]:
    """Process one form: parse + filter its lines, pick style sources.

    Returns [(sample_id, strokes, text_ids, style_img), ...]. The style
    source is drawn from a PER-FORM RandomState seeded by (seed, form), so
    the result is a pure function of the form — identical whether forms run
    serially or on a thread pool, in any order.
    """
    strokes_dir = data_dir / "lineStrokes" / form[:3] / form[:7]
    img_dir = data_dir / "lineImages" / form[:3] / form[:7]
    ascii_path = data_dir / "ascii" / form[:3] / form[:7] / f"{form}.txt"
    if not ascii_path.exists():
        return []

    text_dict = parse_lines_txt(ascii_path)
    form_valid = [
        sid
        for sid, text in text_dict.items()
        if len(text) < max_text_len
        and (strokes_dir / f"{sid}.xml").exists()
        and (img_dir / f"{sid}.tif").exists()
    ]
    rng = np.random.RandomState((seed + zlib.crc32(form.encode())) % (2**32))

    out = []
    for sid in form_valid:
        strokes = parse_strokes_xml(strokes_dir / f"{sid}.xml")
        strokes = pad_stroke_seq(strokes, maxlength=max_seq_len)
        if strokes is None:
            continue

        img = read_img(img_dir / f"{sid}.tif", img_height)
        if img.shape[1] >= img_width:
            continue  # reference drops lines wider than img_width

        style_source = sid
        if len(form_valid) > 1:
            candidates = [s for s in form_valid if s != sid]
            style_source = candidates[rng.randint(len(candidates))]
        style_img = read_img(img_dir / f"{style_source}.tif", img_height)
        if style_img.shape[1] < img_width:
            style_img = pad_img(style_img, img_width, img_height)
        else:
            # The reference feeds the style image at its natural width
            # (adaptive pooling absorbs it, text_style.py:56); keep it
            # uncropped — extract_style_vectors runs odd-width images
            # individually outside the fixed-width batches.
            style_img = style_img.astype("float32")

        out.append(
            (sid, strokes, tokenizer.encode_padded(text_dict[sid], max_text_len), style_img)
        )
    return out


def build_iam_cache(
    data_dir: str | Path,
    kind: str = "train",
    splits_file: str | Path = "data/splits.json",
    img_height: int = 96,
    img_width: int = 1400,
    max_text_len: int = 50,
    max_seq_len: int = 480,
    max_files: int | None = None,
    seed: int = 54321,
    style_apply_fn=None,
    style_batch: int = 32,
    style_weights: str | Path | None = None,
    style_width_bucket: int = 128,
    workers: int | None = None,
) -> IAMCache:
    """Scan the IAM tree and build a packed cache.

    style_apply_fn: jitted fn [B, H, W] image -> [B, 14, 1280]; if None, the
    frozen StyleExtractor is built on the fly from `style_weights` (None
    resolves to <repo>/data/mobilenetv2_tv.npz; a loud warning fires on
    random-init fallback — see dhg.models.style_extractor).

    workers: forms are processed on a thread pool (None = min(8, cpus);
    1 = serial). The per-line work — the native XML scanner (ctypes
    releases the GIL), cv2 image IO — runs outside the GIL, so threads
    scale it. Results are assembled in split order and the style-source
    RNG is per-form, so the cache is IDENTICAL for every worker count
    (pinned by tests/test_iam_integration.py::test_parallel_build_identical).
    """
    data_dir = Path(data_dir)
    tokenizer = Tokenizer()
    if workers is None:
        workers = min(8, os.cpu_count() or 1)

    with open(splits_file) as f:
        splits = json.load(f)

    strokes_all: list[np.ndarray] = []
    text_all: list[np.ndarray] = []
    style_imgs: list[np.ndarray] = []
    sample_ids: list[str] = []

    def worker(form: str):
        return _build_form(
            form, data_dir, img_height, img_width, max_text_len, max_seq_len,
            seed, tokenizer,
        )

    def consume(form_results) -> bool:
        """Append one form's samples in order; True when max_files is hit."""
        for sid, strokes, text_ids, style_img in form_results:
            strokes_all.append(strokes)
            text_all.append(text_ids)
            style_imgs.append(style_img)
            sample_ids.append(sid)
            if max_files and len(sample_ids) >= max_files:
                return True
        return False

    forms = list(splits[kind])
    done = False
    if workers <= 1:
        for form in forms:
            if consume(worker(form)):
                break
    else:
        # Chunked submission (forms stay in split order) so a small
        # max_files smoke build doesn't fan out over the whole split.
        it = iter(forms)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            while not done:
                chunk = list(islice(it, workers * 4))
                if not chunk:
                    break
                for form_results in ex.map(worker, chunk):
                    if consume(form_results):
                        done = True
                        break

    if not sample_ids:
        raise RuntimeError(f"no valid IAM samples found under {data_dir}")

    logger.info("IAM %s: %d samples; extracting style vectors...", kind, len(sample_ids))
    style = extract_style_vectors(
        style_imgs, style_apply_fn, style_batch, style_weights,
        width_bucket=style_width_bucket,
    )

    return IAMCache(
        strokes=np.stack(strokes_all).astype(np.float32),
        text=np.stack(text_all).astype(np.int32),
        style=style,
        sample_ids=sample_ids,
    )


def extract_style_vectors(
    style_imgs,
    style_apply_fn=None,
    batch: int = 32,
    style_weights=None,
    width_bucket: int = 128,
) -> np.ndarray:
    """Run the frozen StyleExtractor over style images.

    Images at the common (padded) width run in fixed-shape batches. The
    rare wider-than-img_width images keep the reference's adaptive-pooling
    semantics (natural width, text_style.py:56) but their widths are
    BUCKETED: each is cv2-resized (cubic, like read_img) to the nearest
    multiple of `width_bucket` (default 128), then grouped per bucketed shape and run in
    batches. Why: every distinct width is its own XLA program, and at real
    scale wide style sources have ~continuous widths — the round-4 12k-line
    dress rehearsal would have compiled ~240 distinct programs (1-6 min
    each over the remote-compile tunnel, i.e. many hours) without this.
    The resize perturbs horizontal scale by <= width_bucket/2 / width
    (~2-3%); a documented divergence. width_bucket=0 restores exact
    natural-width extraction (one compile per distinct width).
    """
    if style_apply_fn is None:
        from dhg.models.style_extractor import init_style_extractor

        _, _, style_apply_fn = init_style_extractor(weights_path=style_weights)

    shapes = {img.shape for img in style_imgs}
    if not shapes:
        return np.zeros((0, 14, 1280), np.float32)
    common = max(shapes, key=lambda s: sum(1 for i in style_imgs if i.shape == s))
    out = [None] * len(style_imgs)

    def run_batched(idx_list, imgs_arr):
        for lo in range(0, len(imgs_arr), batch):
            vecs = np.asarray(style_apply_fn(imgs_arr[lo : lo + batch]))
            for j, idx in enumerate(idx_list[lo : lo + batch]):
                out[idx] = vecs[j]

    batched_idx = [i for i, img in enumerate(style_imgs) if img.shape == common]
    if batched_idx:
        run_batched(
            batched_idx,
            np.stack([style_imgs[i] for i in batched_idx]).astype(np.float32),
        )

    rest = [i for i, img in enumerate(style_imgs) if out[i] is None]
    if rest and width_bucket:
        import cv2

        groups: dict[tuple[int, int], list[int]] = {}
        resized: dict[int, np.ndarray] = {}
        for i in rest:
            img = style_imgs[i]
            h, w = img.shape
            wb = max(width_bucket, int(round(w / width_bucket)) * width_bucket)
            r = (
                img
                if wb == w
                else cv2.resize(
                    img.astype(np.float32), (wb, h), interpolation=cv2.INTER_CUBIC
                )
            )
            resized[i] = r
            groups.setdefault((h, wb), []).append(i)
        for (_, _), idxs in sorted(groups.items()):
            run_batched(idxs, np.stack([resized[i] for i in idxs]).astype(np.float32))
    else:
        for i in rest:
            out[i] = np.asarray(style_apply_fn(style_imgs[i].astype(np.float32)[None]))[0]
    return np.stack(out).astype(np.float32)


def cache_fingerprint(**kwargs) -> str:
    """Stable fingerprint of dataset-build arguments for cache file naming."""
    blob = json.dumps({k: str(v) for k, v in sorted(kwargs.items())})
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


class IAMDataset:
    """Map-style dataset view over the packed cache — drop-in familiarity
    for users of the reference IAMDataset (dataset.py:22-157). Training
    itself never iterates this (batches are gathered on-device); it exists
    for inspection, eval loops, and API compatibility.
    """

    def __init__(self, cache: IAMCache | None = None, **build_kwargs):
        self.cache = cache if cache is not None else build_iam_cache(**build_kwargs)

    def __len__(self) -> int:
        return len(self.cache)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        return {
            "strokes": self.cache.strokes[idx],
            "text": self.cache.text[idx],
            "style": self.cache.style[idx],
        }

    @property
    def dataset(self) -> "IAMDataset":
        return self


def load_or_build_cache(cache_dir: str | Path, **build_kwargs) -> IAMCache:
    """Load the packed cache if present, else build and persist it."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    # workers doesn't change the output (per-form RNG, ordered assembly);
    # _builder version salts the name when the build algorithm changes
    # (v2: per-form style-source RNG replaced the shared sequential one).
    fp = cache_fingerprint(
        _builder=2,
        **{k: v for k, v in build_kwargs.items() if k not in ("style_apply_fn", "workers")},
    )
    path = cache_dir / f"iam_cache_{fp}.npz"
    if path.exists():
        logger.info("loading packed IAM cache %s", path)
        return IAMCache.load(path)
    cache = build_iam_cache(**build_kwargs)
    cache.save(path)
    logger.info("saved packed IAM cache %s (%d samples)", path, len(cache))
    return cache

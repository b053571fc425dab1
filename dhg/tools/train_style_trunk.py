"""Train a writer-discriminative MobileNetV2 style trunk IN-ENVIRONMENT
(round-4 verdict item #2).

The reference's style vectors come from an ImageNet-pretrained MobileNetV2
(reference text_style.py:19-28, weights="IMAGENET1K_V1"); this environment
has no egress, so dhg's trunk is random-init and round 3 measured the
consequence: 45.8% same-writer retrieval ~ the 47.9% raw-pixel baseline
(PERFORMANCE.md "Random-trunk style gap"). This tool closes the actionable
half of that gap WITHOUT egress: it fine-tunes the trunk on synthetic
writers with a writer-ID classification objective and saves the result as
a `style_weights` .npz loadable everywhere a converted torchvision file
would be (dhg/models/style_extractor.py::init_style_extractor — build,
infer, serve all accept dataset_args.style_weights / --style_weights).

Training data: a FAST cv2-based renderer produces pseudo-handwriting lines
from per-writer parameter bundles (slant / thickness / x-height / spacing /
jitter / loopiness — the same knobs as dhg/tools/eval_style_gap.py, writer
ids offset so training writers are DISJOINT from the 8-writer evaluation
benchmark). Evaluation renders the benchmark writers with eval_style_gap's
ORIGINAL (slower, geometrically different) renderer, so the reported
retrieval is held-out in both writer identity and rendering pipeline.

BatchNorm note: the extractor pins BN to eval mode off stored running
stats (reference text_style.py:29-37 forces eval BN; dhg/models/
mobilenetv2.py hard-codes use_running_average=True). Training therefore
updates conv kernels + BN affines while normalization stays fixed —
exactly the network inference runs, no train/eval skew.

Run:  python -m dhg.tools.train_style_trunk [--steps=600] [--writers=128]
          [--per_writer=16] [--batch=64] [--out=data/style_trunk_synth.npz]
Prints training progress and the before/after retrieval table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

STYLE_H = 96


def writer_bundle(writer_id: int) -> dict:
    """Same parameter space as eval_style_gap._writer_params."""
    rng = np.random.default_rng(1000 + writer_id)
    return {
        "slant": float(rng.uniform(-0.45, 0.45)),
        "thickness": float(rng.uniform(0.8, 3.2)),
        "x_height": float(rng.uniform(14.0, 34.0)),
        "spacing": float(rng.uniform(8.0, 22.0)),
        "jitter": float(rng.uniform(0.02, 0.35)),
        "loopiness": float(rng.uniform(0.5, 2.0)),
    }


def render_line_fast(writer_id: int, text_seed: int, width: int = 384) -> np.ndarray:
    """cv2-rasterized pseudo-handwriting line [STYLE_H, width] uint8.

    ~100x faster than eval_style_gap.render_line (C++ polylines instead of
    per-pixel disk stamping) so thousands of training images are cheap; the
    writer parameters mean the same things, the glyph geometry differs —
    which is the point: the EVAL set uses the other renderer, so retrieval
    numbers measure writer-style transfer, not renderer memorization.
    """
    import cv2

    p = writer_bundle(writer_id)
    rng = np.random.default_rng(90_000 + text_seed)
    img = np.full((STYLE_H, width), 255, np.uint8)
    baseline = STYLE_H * 0.62
    x_pen = 10.0
    thickness = max(1, int(round(p["thickness"])))
    while x_pen < width - 20:
        n_arcs = int(rng.integers(2, 5))
        t = np.linspace(0, 1, 16)
        pts = []
        cx, cy = 0.0, 0.0
        for _ in range(n_arcs):
            amp = rng.uniform(0.3, 1.0) * p["loopiness"]
            phase = rng.uniform(0, 2 * np.pi)
            dx = rng.uniform(0.2, 0.7)
            x_arc = cx + t * dx
            y_arc = cy + amp * np.sin(2 * np.pi * t * rng.uniform(0.5, 1.5) + phase) * 0.5
            pts.append(np.stack([x_arc, y_arc], 1))
            cx, cy = x_arc[-1], y_arc[-1]
        curve = np.concatenate(pts, 0)
        gx = curve[:, 0] * p["x_height"]
        gy = curve[:, 1] * p["x_height"]
        gy = gy + rng.normal(0, p["jitter"] * p["x_height"], gy.shape)
        gx = gx + p["slant"] * gy
        px = (x_pen + gx).astype(np.int32)
        py = (baseline - gy).astype(np.int32)
        poly = np.stack([px, py], 1).reshape(-1, 1, 2)
        cv2.polylines(img, [poly], False, 0, thickness=thickness, lineType=cv2.LINE_AA)
        x_pen += p["spacing"] + p["x_height"] * 0.4
    return img


def build_training_set(
    n_writers: int, per_writer: int, width: int, writer_offset: int = 100
):
    """[N, H, W] uint8 images + int32 labels; writers disjoint from the
    eval benchmark (ids 0-7 in eval_style_gap)."""
    imgs, labels = [], []
    for w in range(n_writers):
        for k in range(per_writer):
            imgs.append(render_line_fast(writer_offset + w, (w + writer_offset) * 977 + k, width))
            labels.append(w)
    return np.stack(imgs), np.asarray(labels, np.int32)


def build_tree_training_set(
    tree_root: str,
    n_forms: int = 512,
    width: int = 384,
    min_lines: int = 3,
    holdout_forms: int = 64,
    seed: int = 0,
):
    """Training set from an IAM-shaped tree: writer = FORM (one writer
    bundle per form in gen_iam_scale; one physical writer per form in real
    IAM). Line images are read through the dataset's own read_img (crop +
    resize to height 96), then right-padded with white or randomly cropped
    to a fixed width — in-domain with the images the cache build feeds the
    extractor, unlike the parametric glyph renderer.

    Returns (imgs u8 [N,96,width], labels i32 [N], holdout_imgs,
    holdout_labels) with the holdout forms DISJOINT from training."""
    from collections import defaultdict
    from pathlib import Path

    from dhg.data.images import read_img

    rng = np.random.RandomState(seed)
    by_form: dict[str, list] = defaultdict(list)
    for p in sorted(Path(tree_root, "lineImages").rglob("*.tif")):
        by_form[p.name.rsplit("-", 1)[0]].append(p)
    forms = [f for f, ps in sorted(by_form.items()) if len(ps) >= min_lines]
    rng.shuffle(forms)
    train_forms = forms[:n_forms]
    hold_forms = forms[n_forms : n_forms + holdout_forms]

    def load_set(form_list):
        imgs, labels = [], []
        for li, form in enumerate(form_list):
            for p in by_form[form]:
                img = read_img(p, 96)
                w = img.shape[1]
                if w < width:
                    img = np.pad(img, ((0, 0), (0, width - w)), constant_values=255)
                else:
                    lo = rng.randint(0, w - width + 1)
                    img = img[:, lo : lo + width]
                imgs.append(img.astype(np.uint8))
                labels.append(li)
        return np.stack(imgs), np.asarray(labels, np.int32)

    return (*load_set(train_forms), *load_set(hold_forms))


def train(
    steps: int = 600,
    writers: int = 128,
    per_writer: int = 16,
    batch: int = 64,
    width: int = 384,
    lr: float = 3e-4,
    seed: int = 0,
    out: str | None = None,
    log_every: int = 50,
    tree: str | None = None,
) -> dict:
    import flax
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from dhg.models.style_extractor import StyleExtractor

    t0 = time.time()
    holdout = None
    if tree:
        # In-domain mode: writer = form of an IAM-shaped tree, images read
        # through the dataset's own pipeline (see build_tree_training_set).
        imgs, labels, h_imgs, h_labels = build_tree_training_set(
            tree, n_forms=writers, width=width, seed=seed
        )
        writers = int(labels.max()) + 1
        holdout = (h_imgs, h_labels)
    else:
        imgs, labels = build_training_set(writers, per_writer, width)
    print(
        f"training set: {imgs.shape} ({imgs.nbytes / 1e6:.0f} MB), "
        f"{writers} writers, built in {time.time() - t0:.1f}s",
        flush=True,
    )

    extractor = StyleExtractor()

    class Head(nn.Module):
        n_classes: int

        @nn.compact
        def __call__(self, feats):  # [B, 14, 1280]
            h = feats.mean(axis=1)
            h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-6)
            return nn.Dense(self.n_classes, name="cls")(h * 16.0)

    head = Head(writers)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, STYLE_H, width), jnp.float32)
    ext_vars = extractor.init(key, dummy)
    head_params = head.init(key, extractor.apply(ext_vars, dummy))["params"]

    # Only params train; batch_stats stay the fixed eval-mode stats.
    ext_params = ext_vars["params"]
    ext_stats = ext_vars.get("batch_stats", {})
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(optax.warmup_cosine_decay_schedule(0.0, lr, 50, steps)),
    )
    opt_state = tx.init((ext_params, head_params))

    imgs_dev = jnp.asarray(imgs)  # [N, H, W] uint8, one upload
    labels_dev = jnp.asarray(labels)

    def loss_fn(trainable, x, y):
        ep, hp = trainable
        feats = extractor.apply({"params": ep, "batch_stats": ext_stats}, x)
        logits = head.apply({"params": hp}, feats)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = (logits.argmax(-1) == y).mean()
        return ce, acc

    @jax.jit
    def step_fn(trainable, opt_state, k, imgs_a, labels_a):
        idx = jax.random.randint(k, (batch,), 0, imgs_a.shape[0])
        x = jnp.take(imgs_a, idx, axis=0).astype(jnp.float32)
        y = jnp.take(labels_a, idx, axis=0)
        (ce, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable, x, y)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, ce, acc

    trainable = (ext_params, head_params)
    t0 = time.time()
    for i in range(steps):
        trainable, opt_state, ce, acc = step_fn(
            trainable, opt_state, jax.random.fold_in(key, i), imgs_dev, labels_dev
        )
        if (i + 1) % log_every == 0 or i == 0:
            print(
                f"step {i + 1}/{steps} | ce {float(ce):.3f} | "
                f"batch acc {float(acc):.3f} | {time.time() - t0:.1f}s",
                flush=True,
            )

    ext_params = jax.device_get(trainable[0])
    variables = {"params": ext_params}
    if ext_stats:
        variables["batch_stats"] = jax.device_get(ext_stats)
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    out_path = Path(
        out
        if out is not None
        else Path(__file__).resolve().parents[2] / "data" / "style_trunk_synth.npz"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"saved trained trunk -> {out_path} ({out_path.stat().st_size / 1e6:.1f} MB)")
    res = {"out": str(out_path), "final_ce": float(ce), "final_acc": float(acc)}
    if holdout is not None:
        from dhg.tools.eval_style_gap import _retrieval_metrics

        h_imgs, h_labels = holdout
        feats = []
        for lo in range(0, len(h_imgs), 32):
            x = jnp.asarray(h_imgs[lo : lo + 32]).astype(jnp.float32)
            feats.append(
                np.asarray(
                    extractor.apply(
                        {"params": ext_params, "batch_stats": ext_stats}
                        if ext_stats
                        else {"params": ext_params},
                        x,
                    )
                ).reshape(x.shape[0], -1)
            )
        res["holdout_retrieval"] = _retrieval_metrics(
            np.concatenate(feats), np.asarray(h_labels)
        )
        print("holdout (unseen forms, same tree):", json.dumps(res["holdout_retrieval"]))
    return res


def evaluate(weights: str | None) -> dict:
    """Retrieval on the ORIGINAL 8-writer benchmark (disjoint writers AND a
    different renderer — eval_style_gap.render_line)."""
    import warnings

    from dhg.models.style_extractor import init_style_extractor
    from dhg.tools.eval_style_gap import _retrieval_metrics, render_line

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, _, apply_fn = init_style_extractor(weights_path=weights)
    imgs, labels = [], []
    for w in range(8):
        for k in range(6):
            imgs.append(render_line(w, text_seed=w * 131 + k))
            labels.append(w)
    vecs = np.asarray(apply_fn(np.stack(imgs))).reshape(len(imgs), -1)
    return _retrieval_metrics(vecs, np.asarray(labels))


def main():
    kv = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:] if "=" in a)
    ints = {k: int(v) for k, v in kv.items() if k in
            ("steps", "writers", "per_writer", "batch", "width", "seed", "log_every")}
    res = train(out=kv.get("out"), lr=float(kv.get("lr", 3e-4)), tree=kv.get("tree"), **ints)
    if "tree" not in kv:
        print("== held-out retrieval (8 benchmark writers, other renderer) ==")
        trained = evaluate(res["out"])
        print("  trained trunk:", json.dumps(trained))
        print("(random-trunk baseline 45.8%, raw-pixel 47.9% — PERFORMANCE.md)")


if __name__ == "__main__":
    main()

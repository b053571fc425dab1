"""Frozen style extractor: grayscale line image -> [B, 14, 1280] style vector.

Parity with the reference StyleExtractor (text_style.py:11-59):
  * input scaled to [-1, 1] (x / 127.5 - 1), repeated to 3 channels;
  * MobileNetV2 `features` trunk, frozen, BN in eval mode;
  * AvgPool2d(kernel=3, stride=3) (floor mode — trailing remainder dropped);
  * AdaptiveAvgPool2d((1, 14)) forcing [B, 14, 1280] for any input width;
  * channels-last permute.

Runs as a pure jitted function in the offline data pipeline (style vectors
are precomputed per sample, as in the reference dataset build,
dataset.py:130-132) and once per style image at inference.
"""

from __future__ import annotations

import logging
import warnings
from functools import partial
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dhg.models.mobilenetv2 import MobileNetV2Features

logger = logging.getLogger(__name__)

STYLE_LEN = 14
STYLE_DIM = 1280

# Repo-root-relative default (NOT CWD-relative): <repo>/data/mobilenetv2_tv.npz,
# produced by dhg/tools/convert_torchvision_mnv2.py.
DEFAULT_WEIGHTS_PATH = Path(__file__).resolve().parents[2] / "data" / "mobilenetv2_tv.npz"


def avg_pool_2d_floor(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """AvgPool2d with floor-mode output size (torch default), NHWC."""
    b, h, w, c = x.shape
    oh = (h - window) // stride + 1
    ow = (w - window) // stride + 1
    x = x[:, : (oh - 1) * stride + window, : (ow - 1) * stride + window, :]
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def adaptive_avg_pool_width(x: jnp.ndarray, out_w: int) -> jnp.ndarray:
    """AdaptiveAvgPool over the W axis to exactly out_w bins, torch semantics.

    Bin i covers columns [floor(i*W/out), ceil((i+1)*W/out)). H is fully
    averaged (the (1, 14) target). Shapes are static, so the bin matrix is a
    trace-time constant and the whole op is one [W, out_w] matmul.
    """
    b, h, w, c = x.shape
    starts = np.floor(np.arange(out_w) * w / out_w).astype(np.int64)
    ends = np.ceil((np.arange(out_w) + 1) * w / out_w).astype(np.int64)
    cols = np.arange(w)
    weights = ((cols[:, None] >= starts[None, :]) & (cols[:, None] < ends[None, :])).astype(
        np.float32
    )
    weights /= weights.sum(axis=0, keepdims=True)
    x = x.mean(axis=1)  # average out H -> [B, W, C]
    return jnp.einsum("bwc,wo->boc", x, jnp.asarray(weights, x.dtype))


class StyleExtractor(nn.Module):
    """[B, H, W] grayscale (0..255 floats) -> [B, 14, 1280]."""

    dtype: Any = None

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        x = img.astype(self.dtype or jnp.float32) / 127.5 - 1.0
        x = jnp.repeat(x[..., None], 3, axis=-1)  # [B, H, W, 3]
        x = MobileNetV2Features(dtype=self.dtype, name="mobilenet")(x)
        x = avg_pool_2d_floor(x, 3, 3)
        x = adaptive_avg_pool_width(x, STYLE_LEN)  # [B, 14, 1280]
        return x.astype(jnp.float32)


def init_style_extractor(
    weights_path: str | Path | None = None,
    seed: int = 0,
    dtype: Any = None,
    strict: bool = False,
):
    """Build the frozen extractor and its variables.

    weights_path: an .npz produced by dhg/tools/convert_torchvision_mnv2.py.
    None resolves to the repo-level default (DEFAULT_WEIGHTS_PATH). If the
    file is absent the trunk is deterministically random-initialized from
    `seed` — a LOUD warning is emitted (the reference runs torchvision
    *pretrained* features, text_style.py:19-28, so random-init style vectors
    diverge completely); pass strict=True to raise instead.

    Returns (module, variables, jitted_apply).
    """
    model = StyleExtractor(dtype=dtype)
    dummy = jnp.zeros((1, 96, 192), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy)

    resolved = Path(weights_path) if weights_path is not None else DEFAULT_WEIGHTS_PATH
    if resolved.exists():
        loaded = dict(np.load(resolved))
        variables = _fill_from_flat(variables, loaded)
    else:
        msg = (
            f"MobileNetV2 weights not found at {resolved} — the StyleExtractor "
            "is RANDOM-INITIALIZED and its style vectors will not match the "
            "reference's pretrained features. Convert torchvision weights with "
            "`python -m dhg.tools.convert_torchvision_mnv2` or pass "
            "strict=False knowingly."
        )
        if strict:
            raise FileNotFoundError(msg)
        warnings.warn(msg, UserWarning, stacklevel=2)
        logger.warning(msg)

    @partial(jax.jit, static_argnums=())
    def apply_fn(img):
        return model.apply(variables, img)

    return model, variables, apply_fn


def _fill_from_flat(variables, flat: dict):
    """Overwrite variables with entries from a {'/'.join(path): array} dict."""
    import flax

    flat_vars = flax.traverse_util.flatten_dict(variables, sep="/")
    missing = []
    for key in flat_vars:
        if key in flat:
            assert flat_vars[key].shape == flat[key].shape, (
                key,
                flat_vars[key].shape,
                flat[key].shape,
            )
            flat_vars[key] = jnp.asarray(flat[key])
        else:
            missing.append(key)
    if missing:
        raise KeyError(f"weight file missing {len(missing)} entries, e.g. {missing[:3]}")
    return flax.traverse_util.unflatten_dict(flat_vars, sep="/")

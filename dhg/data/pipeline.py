"""Device-resident batch sampling for training.

The reference draws a fresh shuffled DataLoader iterator every step
(train.py:98), i.e. i.i.d. random batches. Here the whole packed cache lives
in device memory (IAM fits in a few hundred MB) and batches are gathered
*inside* the jitted train step via jax.random.randint + take — zero
host<->device traffic per step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeviceDataset:
    """Packed arrays uploaded once; index-gather batching under jit."""

    strokes: jax.Array  # f32 [N, T, 3]
    text: jax.Array  # i32 [N, L]
    style: jax.Array  # f32 [N, 14, 1280]

    @classmethod
    def from_cache(cls, cache, sharding=None) -> "DeviceDataset":
        def put(x):
            return jax.device_put(jnp.asarray(x), sharding) if sharding else jnp.asarray(x)

        return cls(put(cache.strokes), put(cache.text), put(cache.style))

    @property
    def size(self) -> int:
        return self.strokes.shape[0]

    @property
    def arrays(self):
        """The packed arrays as a pytree, for passing INTO jit as arguments.

        Closing over these in a jitted function embeds them as HLO literals
        — at IAM scale (hundreds of MB, style alone is N x 14 x 1280 f32)
        that bloats the serialized program past the remote-compile
        service's request limit (HTTP 413, measured at max_files=4096).
        Passing them as arguments keeps them device buffers referenced by
        parameter id; the program stays a few MB regardless of cache size.
        """
        return (self.strokes, self.text, self.style)

    def sample_batch(self, key: jax.Array, batch_size: int):
        """Gather a random batch; call inside jit."""
        return gather_batch(self.arrays, key, batch_size)


def gather_batch(arrays, key: jax.Array, batch_size: int):
    """Random-index gather of a batch from packed (strokes, text, style)
    arrays — jit-traceable on array ARGUMENTS (see DeviceDataset.arrays)."""
    strokes, text, style = arrays
    idx = jax.random.randint(key, (batch_size,), 0, strokes.shape[0])
    return (
        jnp.take(strokes, idx, axis=0),
        jnp.take(text, idx, axis=0),
        jnp.take(style, idx, axis=0),
    )


def augment_matrices(
    key: jax.Array,
    n: int,
    scale: float = 0.0,
    rotate: float = 0.0,
    shear: float = 0.0,
) -> jax.Array:
    """Per-sample 2x2 linear maps for on-device stroke augmentation.

    A_i = R(theta_i) @ Shear(h_i) @ (s_i * I) with theta ~ U(-rotate, rotate)
    radians, h ~ U(-shear, shear), s ~ U(1-scale, 1+scale). Returns f32
    [n, 2, 2]. All-zero knobs give exact identity matrices.

    Strokes are stored as (dx, dy) deltas, so a linear map applied to the
    deltas IS the same map applied to the absolute trajectory (linearity
    commutes with differencing) — and padding rows (0, 0, pen=1;
    reference utils/preprocessing.py:20-26) map to (0, 0), so the padding
    contract survives augmentation untouched.
    """
    k_s, k_r, k_h = jax.random.split(key, 3)
    s = 1.0 + jax.random.uniform(k_s, (n,), minval=-scale, maxval=scale)
    theta = jax.random.uniform(k_r, (n,), minval=-rotate, maxval=rotate)
    h = jax.random.uniform(k_h, (n,), minval=-shear, maxval=shear)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # R @ Shear, then the isotropic scale folds in as a scalar factor.
    a00 = cos
    a01 = cos * h - sin
    a10 = sin
    a11 = sin * h + cos
    rows = jnp.stack(
        [jnp.stack([a00, a01], -1), jnp.stack([a10, a11], -1)], axis=1
    )  # [n, 2, 2]
    return rows * s[:, None, None]


def augment_strokes(key: jax.Array, strokes3: jax.Array, **knobs) -> jax.Array:
    """Apply per-sample augment_matrices to the (dx, dy) channels of a
    [B, T, 3] stroke batch; the pen channel passes through unchanged.
    Jit-traceable — designed to run INSIDE the jitted train step (zero
    host cost; the reference has no augmentation at all)."""
    mats = augment_matrices(key, strokes3.shape[0], **knobs)
    xy = jnp.einsum("btc,bdc->btd", strokes3[..., :2], mats)
    return jnp.concatenate([xy, strokes3[..., 2:]], axis=-1)


def synthetic_cache(
    n: int = 64,
    max_seq_len: int = 480,
    max_text_len: int = 50,
    seed: int = 0,
):
    """A tiny synthetic IAMCache-shaped dataset (no IAM files, no MobileNet).

    Strokes are smooth random walks with sparse pen lifts, texts are random
    token sequences — enough to exercise the full train/sample path.
    """
    from dhg.data.iam import IAMCache

    rng = np.random.RandomState(seed)
    deltas = rng.randn(n, max_seq_len, 2).astype(np.float32)
    # Smooth them a little so std-normalization resembles real data.
    deltas = (deltas + np.roll(deltas, 1, axis=1)) / 2.0
    deltas /= deltas.std()
    pen = (rng.rand(n, max_seq_len, 1) < 0.05).astype(np.float32)
    strokes = np.concatenate([deltas, pen], axis=-1)

    lengths = rng.randint(10, max_text_len - 1, size=n)
    text = np.zeros((n, max_text_len), dtype=np.int32)
    for i, l in enumerate(lengths):
        text[i, :l] = rng.randint(2, 73, size=l)
        text[i, l] = 1  # EOS

    style = rng.randn(n, 14, 1280).astype(np.float32)
    return IAMCache(strokes=strokes, text=text, style=style, sample_ids=[f"syn-{i:04d}" for i in range(n)])

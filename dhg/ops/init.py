"""Weight initializers matching torch defaults, for training-dynamics parity.

torch.nn.Linear / Conv1d default to kaiming_uniform(a=sqrt(5)) for the weight,
which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); the bias is
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with the *layer's* fan_in. Flax's defaults
(lecun_normal / zero bias) would give a different loss trajectory, so the
torch-style scheme is used everywhere the reference uses Linear/Conv1d.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Works for Dense kernels (in, out) and Conv kernels (kw, in, out):
    fan_in = prod(shape[:-1]).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int):
    """Bias initializer factory: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def normal_embed_init(key, shape, dtype=jnp.float32):
    """N(0, 1) — torch nn.Embedding default."""
    return jax.random.normal(key, shape, dtype)

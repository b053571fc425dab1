"""Parameter sharding rules: tensor-parallel seams over the 'model' axis.

Megatron-style column/row sharding on the two dominant matmul families:

  * FFN pairs (fc1/fc2, incl. the 2048-hidden sigma MLP): fc1 kernel is
    column-sharded P(None, 'model') so each shard owns a slice of the hidden;
    fc2 kernel is row-sharded P('model', None) — XLA inserts a single
    psum on fc2's output, riding ICI.
  * Attention q/k/v projections are column-sharded (head-parallel) and the
    output projection row-sharded, same single-collective pattern.

Everything else (convs, embeddings, affine FiLM layers, heads) is replicated
— they are tiny. With mesh model=1 every spec collapses to replication.
"""

from __future__ import annotations

import flax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dhg.parallel.mesh import MODEL_AXIS


def _spec_for(path: tuple[str, ...], shape: tuple[int, ...]) -> P:
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    # FFN hidden sharding (dhg.ops.basic.FFN submodules are fc1/fc2).
    if parent == "fc1":
        if name == "kernel":
            return P(None, MODEL_AXIS)
        if name == "bias":
            return P(MODEL_AXIS)
    if parent == "fc2" and name == "kernel":
        return P(MODEL_AXIS, None)

    # Attention head sharding (MultiHeadAttention submodules wq/wk/wv/dense).
    if parent in ("wq", "wk", "wv"):
        if name == "kernel":
            return P(None, MODEL_AXIS)
        if name == "bias":
            return P(MODEL_AXIS)
    if parent == "dense" and name == "kernel":
        return P(MODEL_AXIS, None)

    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`' structure."""
    flat = flax.traverse_util.flatten_dict(params)
    specs = {k: NamedSharding(mesh, _spec_for(k, v.shape)) for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(specs)

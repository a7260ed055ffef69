"""Device mesh + partition rules.

The scaling axis of this workload is the **catalog** (SURVEY.md §2.3):
models are a few M params, sessions are <=20 items, but the item
embedding table is ``[num_items, d]`` and every step ends in a
``[B, d] x [d, num_items]`` matmul + top-k.  The mesh is therefore
``(data, model)``:

* ``data``  — batch dimension; gradients psum over it.
* ``model`` — catalog dimension; the embedding table is row-sharded,
  catalog logits are column-sharded, log-softmax needs only a psum of
  per-shard max/sum, and top-k merges per-shard candidates.

Everything runs through GSPMD (jit + sharding constraints), with
hand-written shard_map paths for the logits/top-k hot ops in
``sessionrec_tpu.parallel.sharded``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  ``data=-1`` -> use all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_sharding(mesh: Mesh, params):
    """PartitionSpecs for a model param tree.

    The embedding table (the only large tensor) is row-sharded over
    ``model``; everything else is replicated.  The catalog is padded to a
    multiple of 128 so it divides evenly for any model-axis size that
    divides 128.
    """
    def spec(path, leaf):
        keys = [getattr(e, "key", getattr(e, "name", None)) for e in path]
        if "embedding" in keys:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh, batch):
    """Shard every batch leaf along its leading (batch) dimension."""
    def spec(leaf):
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (leaf.ndim - 1))))
    return jax.tree_util.tree_map(spec, batch)


def chunk_sharding(mesh: Mesh, chunk):
    """Shard a stacked ``[G, B, ...]`` chunk of batches (runner.py
    ``stack_batches``) along the batch axis (axis 1); the scan axis G
    stays replicated."""
    def spec(leaf):
        return NamedSharding(mesh,
                             P(None, DATA_AXIS, *([None] * (leaf.ndim - 2))))
    return jax.tree_util.tree_map(spec, chunk)


def replicated(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)


def with_mesh(model, mesh):
    """Bind the mesh to the model so its embedding gathers route through
    the explicit shard_map'd lookup (parallel/lookup.py).  Models carry
    an optional ``mesh`` field; identity when already bound or no mesh."""
    import dataclasses
    if mesh is None or getattr(model, "mesh", None) is mesh:
        return model
    return dataclasses.replace(model, mesh=mesh)

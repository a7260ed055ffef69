"""sessionrec_tpu — a TPU-native session-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
SpaceLearner/SessionRec-pytorch reference (DGL 0.7 + PyTorch 1.10):
SRGNN / NISER+ / LESSR / MSGIFSR session-graph recommenders scored against
the full item catalog (HR@20 / MRR@20).

Design stance (TPU-first, not a port):

* **Dense, static shapes.** The reference builds one ragged DGL graph per
  session in DataLoader workers (reference: src/utils/data/collate.py).
  Here every session graph is a fixed-shape, padded pytree: node arrays
  ``[B, N_max]``, adjacency tensors ``[B, N, N]`` and masks. All DGL
  sparse kernels (segment softmax / edge softmax / gather-scatter SpMM)
  become batched dense masked ops that XLA tiles onto the MXU/VPU with
  zero recompiles (sessions are capped at 20 items upstream, so N_max is
  tiny and padding is cheap).
* **Functional transforms.** Models are pure functions over parameter
  pytrees; the train step is a single ``jit``-compiled function.
* **Sharding.** A ``(data, model)`` mesh: item-embedding table row-sharded
  over ``model``, batch sharded over ``data``; full-catalog logits,
  log-softmax and top-k ride XLA collectives (see ``sessionrec_tpu.parallel``).
* **Pallas** kernels for the catalog-axis hot path (fused scoring /
  cross-entropy) live in ``sessionrec_tpu.ops.pallas``.
"""

__version__ = "0.1.0"

from sessionrec_tpu.utils.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    preset,
)

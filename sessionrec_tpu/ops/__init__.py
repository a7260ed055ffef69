"""TPU-native compute ops: dense masked replacements for the DGL kernel surface.

The reference's native kernel surface (SURVEY.md §2.4) — ``update_all``
gather-scatter SpMM, ``segment_softmax`` / ``segment_reduce``,
``edge_softmax``, ``u_add_v`` / ``u_mul_e_sum``, ``broadcast_nodes`` —
is re-expressed here over the dense per-session layout
(``[B, N]`` nodes + ``[B, N_src, N_dst]`` adjacency) as batched masked
tensor ops.
"""

from sessionrec_tpu.ops.masked import (  # noqa: F401
    masked_max,
    masked_mean,
    masked_softmax,
    masked_sum,
)
from sessionrec_tpu.ops.gru import gru_cell, gru_scan, masked_mailbox_gru  # noqa: F401

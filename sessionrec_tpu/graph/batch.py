"""Fixed-shape batch pytrees — the dense replacement for ``dgl.batch``.

The reference batches ragged per-session DGL graphs into one disjoint-union
sparse graph (reference: src/utils/data/collate.py:219-256).  Here a batch
is a pytree of fixed-shape arrays: one row per session, padded to static
maxima.  Sessions are truncated to <=20 items by preprocessing
(reference: src/utils/data/preprocess.py:45-50), so the per-session node
budget is tiny and dense ``[B, N, N]`` adjacency tensors are cheap; all
graph kernels become batched masked matmuls/softmaxes on the MXU/VPU.

Conventions:
  * ``adj[b, u, v]`` is the weight/multiplicity of edge ``u -> v``
    (src-major).  In-neighbour aggregation for destinations is a
    contraction over axis 1.
  * node index 0 .. n_nodes-1 are real, the rest padding; ``node_mask``
    marks real nodes.  Padded ``iid`` entries are 0 (they are never
    selected through a mask, but keep them in-range for gathers).
  * ``valid`` marks real examples; the final partial batch is padded to
    the static batch size.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp  # dtype docs + SplitBatch concat views


@struct.dataclass
class SessionGraphBatch:
    """Weighted session graph for SRGNN/NISER.

    Mirrors ``seq_to_session_graph`` (reference: collate.py:61-85):
    nodes are the unique items of the session in ascending item-id order,
    edges are deduplicated consecutive pairs with count weights, and a
    session with no edges gets the degenerate self-loop 0->0 with w=1
    (collate.py:74-76).
    """

    node_iid: "jnp.ndarray"   # [B, N] int32
    node_mask: "jnp.ndarray"  # [B, N] float32
    adj: "jnp.ndarray"        # [B, N, N] float32; adj[b,u,v] = weight of u->v
    last_idx: "jnp.ndarray"   # [B] int32 — node index of the session's last item
    labels: "jnp.ndarray"     # [B] int32 — next-item label
    valid: "jnp.ndarray"      # [B] float32 — example mask


@struct.dataclass
class LessrBatch:
    """EOP multigraph + shortcut graph for LESSR.

    The EOP multigraph (collate.py:29-44) keeps duplicate consecutive
    edges in temporal order; it is materialised as per-destination
    *mailboxes*: ``mail_idx[b, v, j]`` is the node index of the j-th
    in-message's source, in edge-insertion (= temporal) order — exactly
    the ordering LESSR's EOPA GRU reducer requires (lessr.py:20-27).

    The shortcut graph (collate.py:46-59) is deduplicated "u occurred
    at-or-before v" pairs (self-loops included) as a 0/1 adjacency.
    """

    node_iid: "jnp.ndarray"   # [B, N] int32
    node_mask: "jnp.ndarray"  # [B, N] float32
    mail_idx: "jnp.ndarray"   # [B, N, D] int32 — src node of j-th in-message of v
    mail_mask: "jnp.ndarray"  # [B, N, D] float32
    sc_adj: "jnp.ndarray"     # [B, N, N] float32 0/1 shortcut adjacency (u->v)
    last_idx: "jnp.ndarray"   # [B] int32
    labels: "jnp.ndarray"     # [B] int32
    valid: "jnp.ndarray"      # [B] float32


@struct.dataclass
class CcsLevel:
    """One granularity level of the CCS heterograph (collate.py:87-217).

    Level ``k`` nodes are the distinct consecutive k-grams of the session
    in first-occurrence order; ``iid`` stores the k member item ids per
    node.  A session shorter than ``k`` gets a single pad node whose iid
    is the session's smallest item id repeated (collate.py:203-207) and
    which is also the level's "last" node (collate.py:134-137).
    """

    iid: "jnp.ndarray"        # [B, Nk, k] int32 member item ids
    mask: "jnp.ndarray"       # [B, Nk] float32
    intra_adj: "jnp.ndarray"  # [B, Nk, Nk] float32 0/1 (dedup; weights dropped
    #   to match the reference, which computes but never attaches them,
    #   collate.py:154-159)
    last_idx: "jnp.ndarray"   # [B] int32


@struct.dataclass
class CcsBatch:
    """Multi-granularity CCS heterograph batch for MSGIFSR."""

    levels: tuple  # tuple[CcsLevel] for k = 1..K
    # inter edges exist for k >= 2; tuples are indexed by k-2.
    inter_in: tuple   # tuple of [B, N1, Nk] 0/1 — s1 -> sk (item precedes k-gram)
    inter_out: tuple  # tuple of [B, Nk, N1] 0/1 — sk -> s1 (k-gram precedes item)
    labels: "jnp.ndarray"  # [B] int32
    valid: "jnp.ndarray"   # [B] float32

    @property
    def order(self) -> int:
        return len(self.levels)


@struct.dataclass
class SplitBatch:
    """Length-bucketed batch: the SAME example set as an unsplit batch,
    partitioned by prefix length into two fixed sub-blocks compiled at
    different static node caps.

    Motivation (measured, round 5): every model used to compile at the
    single data-derived node cap N=20 while 92% of real prefix-augmented
    examples have <= 8 items (datasets/sample; mean 3.5, median 2) — yet
    at batch 512 essentially every batch contains ~40 long examples, so
    per-batch bucket *selection* is useless.  Splitting within the batch
    is not: the graph-side (attention soups scaling with N^2, projections
    with N) runs twice at [B_short, 8] + [B_long, 20] shapes, the
    session vectors concatenate, and the length-independent catalog loss
    runs once over the combined rows.

    Semantics: each optimizer/eval step sees exactly the same example
    set as the unsplit batch (row order within a batch permutes, which
    no computed quantity depends on — losses and metric sums are
    row-permutation-invariant; padded rows carry ``valid=0`` and
    all-zero masks exactly like tail-batch padding).  For BN-free models
    this is identical math; LESSR's BatchNorm computes its batch
    statistics JOINTLY across the two blocks (models/lessr.py), so its
    training math matches the unsplit batch too (up to float summation
    order).

    Reference analog: DGL sizes each batched graph by its actual
    sessions (collate.py:87-217 — raggedness is the reference's answer
    to this); dense static shapes answer it with two buckets.

    NESTING (round 5): ``short`` may itself be a SplitBatch, giving
    three or more tiers — e.g. ``SplitBatch(SplitBatch(<=4@4, 5-8@8),
    >8@20)``.  Every consumer recurses (model heads, the labels/valid
    views below, the mesh row joins), so the tier count is purely a
    loader decision.  Measured (scripts/probe_split3.py, TPU v5e,
    realistic lengths): tiers (4, 8) beat the single 8 split by 1.16x
    on the order-3 paper config and 1.04x on order-1; a fourth tier
    adds nothing.
    """

    short: "object"   # batch pytree (Session/Lessr/Ccs) at the short caps
    long: "object"    # same kind at the full caps

    @property
    def labels(self):
        return jnp.concatenate([self.short.labels, self.long.labels], axis=0)

    @property
    def valid(self):
        return jnp.concatenate([self.short.valid, self.long.valid], axis=0)

    @property
    def order(self) -> int:
        return self.long.order


def flatten_blocks(batch):
    """Leaf blocks of a (possibly nested) SplitBatch, shortest tier
    first; ``[batch]`` for an unsplit batch."""
    if isinstance(batch, SplitBatch):
        return flatten_blocks(batch.short) + flatten_blocks(batch.long)
    return [batch]


def nest_blocks(blocks):
    """Left-nested SplitBatch over ``blocks`` (inverse of
    ``flatten_blocks``); identity for a single block."""
    nested = blocks[0]
    for b in blocks[1:]:
        nested = SplitBatch(short=nested, long=b)
    return nested

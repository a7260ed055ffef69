"""Multi-host (multi-process) runtime.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3); this
module is the new capability that scales the same training semantics
across hosts:

* ``initialize`` wires ``jax.distributed`` (explicit coordinator flags, or
  the TPU-pod auto-detection when run with no arguments under a launcher).
* Each host builds **only its slice of every global batch** — the global
  example stream stays the reference's time-ordered prefix-augmented
  sequence (README.md:37), global batch k = examples ``[kB, (k+1)B)``, and
  host h materialises the contiguous rows its addressable devices own
  along the mesh's ``data`` axis (``local_batch_slice``).  Shuffled
  streams stay consistent because the epoch-k permutation is a pure
  function of (seed, k) on every host (data/loader.py).
* ``place_chunk`` assembles the global device array from per-process local
  rows via ``jax.make_array_from_process_local_data`` — no host ever
  materialises the full global batch.
* Logging/metrics are primary-only; orbax checkpointing stays collective
  (every process participates in the array save; the sidecar json is
  written by the primary).

Tested by a real 2-process × 4-CPU-device simulation
(tests/test_multihost.py) whose metrics must match the single-process
8-device run bit-for-bit.
"""

from __future__ import annotations

import jax
import numpy as np

from sessionrec_tpu.parallel.mesh import DATA_AXIS
from sessionrec_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Wire up jax.distributed.  With explicit args this is a manual
    multi-process launch (e.g. one process per host over DCN); with all
    args None it is a no-op unless a cluster environment is detected by
    JAX itself (TPU pod slices auto-populate coordinator/process info).
    Must run before any other JAX call."""
    if coordinator is None and num_processes is None and process_id is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("jax.distributed initialised: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_slice(mesh, global_batch: int) -> tuple[int, int]:
    """Rows of each global batch owned by this process's devices.

    The mesh's ``data`` axis splits the batch into ``dp`` contiguous row
    blocks (block d = rows ``[d*B/dp, (d+1)*B/dp)``).  This process owns
    the blocks of the data-axis positions where it has at least one
    addressable device; those positions must be contiguous (true for the
    standard layout: ``jax.devices()`` is ordered by process and the
    ``model`` axis is the minor mesh dimension).
    """
    dp = mesh.shape[DATA_AXIS]
    if global_batch % dp != 0:
        raise ValueError(f"batch size {global_batch} not divisible by "
                         f"data-parallel degree {dp}")
    if jax.process_count() == 1:
        return 0, global_batch
    pid = jax.process_index()
    axis = mesh.axis_names.index(DATA_AXIS)
    dev = np.moveaxis(mesh.devices, axis, 0).reshape(dp, -1)
    rows = [d for d in range(dp)
            if any(x.process_index == pid for x in dev[d])]
    if rows != list(range(rows[0], rows[-1] + 1)):
        raise ValueError(
            f"process {pid}'s data-axis positions {rows} are not "
            "contiguous; lay the mesh out with 'model' as the minor axis "
            "inside each host")
    per = global_batch // dp
    return rows[0] * per, (rows[-1] + 1) * per


def _owned_data_rows(mesh) -> tuple[int, int]:
    """(data-axis positions owned by this process, total dp)."""
    dp = mesh.shape[DATA_AXIS]
    pid = jax.process_index()
    axis = mesh.axis_names.index(DATA_AXIS)
    dev = np.moveaxis(mesh.devices, axis, 0).reshape(dp, -1)
    owned = sum(1 for d in range(dp)
                if any(x.process_index == pid for x in dev[d]))
    return owned, dp


def place_chunk(mesh, stacked, global_batch: int | None = None):
    """Assemble global ``[G, B_global, ...]`` device arrays from this
    process's local ``[G, B_local, ...]`` stacked chunk (runner.py
    ``stack_batches``), sharded (None, data, ...).  ``global_batch``
    defaults to ``B_local * dp / owned_rows`` (exact for the contiguous
    layout ``local_batch_slice`` enforces)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    owned, dp = _owned_data_rows(mesh)

    def put(leaf):
        gb = global_batch if global_batch is not None \
            else leaf.shape[1] * dp // owned
        gshape = (leaf.shape[0], gb) + leaf.shape[2:]
        sh = NamedSharding(
            mesh, P(None, DATA_AXIS, *([None] * (leaf.ndim - 2))))
        return jax.make_array_from_process_local_data(sh, leaf, gshape)

    return jax.tree_util.tree_map(put, stacked)

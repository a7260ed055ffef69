"""Subprocess worker for tests/test_multihost.py: one simulated host.

Must configure the CPU backend and device count BEFORE importing jax
(argv: port, process_id, num_processes, devices_per_proc, then CLI train
flags to append)."""

import os
import sys

port, pid, nproc, ndev = sys.argv[1:5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sessionrec_tpu.cli import main  # noqa: E402

args = ["train", *sys.argv[5:]]
if int(nproc) > 1:
    args += ["--coordinator", f"localhost:{port}",
             "--num-processes", nproc, "--process-id", pid]
main(args)

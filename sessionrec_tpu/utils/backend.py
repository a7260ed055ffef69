"""Backend selection helpers for scripts and tests.

The ambient container pins the remote-TPU backend at interpreter
startup (a sitecustomize imports jax and sets the platform), so
``JAX_PLATFORMS=cpu`` in the environment alone is NOT enough to run on
the virtual-device CPU backend — both the env var and ``jax.config``
must be set before the backend initialises (tests/conftest.py does the
same dance).
"""

from __future__ import annotations

import os


def force_cpu_backend(n_devices: int = 8) -> None:
    """Pin jax to the CPU platform with ``n_devices`` virtual devices.

    Must run before the first backend-initialising jax call (importing
    jax is fine; calling ``jax.devices()`` is not).  Appends the
    ``xla_force_host_platform_device_count`` flag only if the caller's
    environment has not already chosen a count.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

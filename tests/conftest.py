"""Test config: force the CPU backend with 8 virtual devices so sharding
tests exercise a real multi-device mesh without a pod
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count).

The ambient environment may pin JAX_PLATFORMS to a TPU backend and may
even import jax from sitecustomize before this file runs, so the env
vars alone are not enough — jax.config is updated explicitly before any
backend is initialised."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

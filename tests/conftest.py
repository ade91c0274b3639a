"""Test env: force CPU with 8 virtual devices so Mesh/pjit collectives are
exercised without TPU hardware (the standard JAX idiom — SURVEY.md §4).

The container's sitecustomize registers the `axon` TPU-tunnel backend and
pins ``jax.config.jax_platforms = "axon,cpu"`` at the *config* level, which
outranks the JAX_PLATFORMS env var — so we must override the config after
importing jax, before any backend is used.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

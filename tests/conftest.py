"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the TPU ('axon')
platform before pytest starts, so env vars alone don't redirect tests to
CPU — we update jax.config directly. Sharding tests exercise real
multi-device code paths on the 8 virtual CPU devices, an improvement over
the reference, which can only exercise its distributed paths by launching
real ranks (reference ``src/training/distributed.py:24-60``).
"""
import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

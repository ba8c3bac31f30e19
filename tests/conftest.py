"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (``--xla_force_host_platform_device_count=8``),
exactly the strategy SURVEY §4 prescribes (and the reference lacks: it has
zero distributed tests).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

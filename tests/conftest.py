"""Test configuration: run on CPU with 8 virtual devices and float64.

Multi-chip sharding is exercised on a virtual CPU mesh (the analog of the
reference's oversubscribed local `mpiexec -np 12`, SURVEY section 4); the
real-TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)

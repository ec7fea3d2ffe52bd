"""Test configuration: run on CPU with 8 virtual devices and float64.

Multi-chip sharding is exercised on a virtual CPU mesh (the analog of the
reference's oversubscribed local `mpiexec -np 12`, SURVEY section 4); the
real-TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# NOTE: the env var alone is not enough — the preinstalled axon TPU plugin
# registers itself regardless, so force the platform through the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

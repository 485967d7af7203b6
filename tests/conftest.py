"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (the same
strategy the driver's dryrun uses); real-TPU benchmarking happens in bench.py.
Must set env before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's TPU tunnel for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU backend and forces
# jax_platforms='axon,cpu'; override after import so tests stay on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

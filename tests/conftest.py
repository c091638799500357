"""Test harness configuration.

All tests run on CPU with 8 virtual devices (multi-chip sharding is validated
on a simulated mesh — SURVEY.md §4.4) and float64 enabled so golden energies
from the reference (computed in Julia Float64) match to 1e-6.
"""

import os

# Hard override: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on local CPU with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env var alone is not honoured here
jax.config.update("jax_enable_x64", True)
# NOTE: no persistent compilation cache for CPU tests — processes in this
# environment land on hosts with differing CPU features, and stale AOT cache
# entries fail to load (or SIGILL). CPU compiles are fast enough without it.

"""Test configuration: force CPU backend with 8 virtual devices and x64.

The reference implementation (hydra-pspec) is float64/complex128 NumPy/SciPy.
Correctness tests run on CPU with x64 enabled so we can compare against
NumPy oracles at tight tolerances; multi-device sharding tests use the
8 virtual CPU devices as a "fake pod".
"""
import os

# Force-override: the shell environment pins JAX_PLATFORMS to the TPU
# backend; correctness tests must run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

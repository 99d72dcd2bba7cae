"""Test configuration: run on a virtual 8-device CPU mesh in float64.

The reference's tests use double precision throughout; we match that on CPU.
Multi-chip sharding tests use the 8 virtual devices.  TPU benchmarks run
separately (bench.py) in float32.
"""
import os

# N.B. the axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU); tests
# must run on local CPU, so force it via both the env var and jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from idto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

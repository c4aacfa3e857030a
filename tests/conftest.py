"""Test configuration: force an 8-device virtual CPU mesh.

Distributed correctness is validated without a pod slice via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md section 4 item
4); Pallas kernels run in interpret mode on CPU. TPU-hardware runs happen via
bench.py and scripts/, not the unit suite.
"""
import os
import sys

# Force CPU regardless of the ambient JAX_PLATFORMS (the sandbox sets 'axon').
# NOTE: a sitecustomize.py registers the TPU plugin and imports jax at
# interpreter startup — before this conftest — so the env var alone is not
# enough; the jax.config.update below is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
# XLA:CPU compiles are slow in this image (~0.3-1.5s per executable, mostly
# IO-blocked); persist them across test runs. MUST go through the config API:
# the sandbox's sitecustomize imports jax at interpreter startup, so the
# JAX_COMPILATION_CACHE_DIR env var is read (empty) before this file runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.join(os.path.dirname(
                                     os.path.dirname(os.path.abspath(__file__))),
                                     ".jax_cache_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

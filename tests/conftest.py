"""Test configuration: force an 8-device virtual CPU mesh.

Distributed correctness is validated without a pod slice via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md section 4 item
4); Pallas kernels run in interpret mode on CPU. TPU-hardware runs happen via
bench.py and scripts/, not the unit suite.
"""
import os
import sys

# Force CPU regardless of the ambient JAX_PLATFORMS (the sandbox sets 'axon').
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# XLA:CPU compiles are slow in this image (~0.3-1s per executable); cache them
# across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip sharding is validated on a host-platform device mesh (the real
TPU bench runs separately via bench.py).  In this environment a
sitecustomize hook imports jax at interpreter startup, so plain env vars are
read too late — jax.config.update is required.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_fastqdedup_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

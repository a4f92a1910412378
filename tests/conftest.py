"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (jax.sharding.Mesh / shard_map) are exercised
without TPU hardware.

This container's sitecustomize registers an `axon` TPU PJRT plugin and
imports jax at interpreter start, capturing JAX_PLATFORMS=axon from the
environment; initializing that backend dials the TPU relay and can block
forever in a CPU-only test run. Setting os.environ afterwards is too
late — but `jax.config.update("jax_platforms", "cpu")` before the first
backend initialization reliably forces CPU. XLA_FLAGS is read lazily at
backend init, so the virtual-device flag still applies here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# jax 0.9 ignores --xla_force_host_platform_device_count here; the
# config knob is what actually provisions the 8 virtual CPU devices.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests need multiple devices; the build machine has at most one real
TPU chip, so all tests run on the XLA CPU backend with 8 virtual devices
(SURVEY.md §4: multi-host tests on a CPU mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the harness presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The wavefront traversal's while-loop body triggers pathological LLVM
# optimization times on the XLA CPU backend (>100s vs 7s); the expensive
# passes only matter for CPU production throughput, not correctness tests.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

# The axon TPU plugin's sitecustomize pins jax_platforms='axon,cpu' at
# interpreter startup; the env var alone cannot undo that — override the
# config directly before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the traversal while-loop compiles are the
# dominant test cost; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

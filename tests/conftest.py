"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests need multiple devices; the build machine has at most one real
TPU chip, so all tests run on the XLA CPU backend with 8 virtual devices
(SURVEY.md §4: multi-host tests on a CPU mesh).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The wavefront traversal's while-loop body triggers pathological LLVM
# optimization times on the XLA CPU backend (>100s vs 7s); the expensive
# passes only matter for CPU production throughput, not correctness tests.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags

#!/usr/bin/env python
"""Per-process worker for the multi-process CPU-mesh selftest.

`jax.distributed.initialize` must run before ANYTHING initializes the XLA
backend — and importing `octree_pathtracing_tpu` builds module-level jnp
constants, which does.  So this launcher lives outside the package: it brings
the distributed runtime up from the JAX_* env vars first, then imports the
package and runs the selftest (tests/test_distributed.py spawns two of these).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    # the axon TPU sitecustomize pins jax_platforms at interpreter start;
    # honor the env var before any backend initializes
    jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]),
)

from octree_pathtracing_tpu.parallel.distributed import _selftest  # noqa: E402

_selftest()

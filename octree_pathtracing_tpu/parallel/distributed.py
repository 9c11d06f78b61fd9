"""Multi-process (multi-host) runtime entry — `jax.distributed` + DCN.

The reference is strictly single-process (SURVEY.md §5 "Distributed
communication backend: none"; concurrency is std::thread + mpsc,
``/root/reference/src/renderer/tile_renderer.rs:302-303``).  The TPU-native
framework replaces that with the standard JAX multi-controller model:

- every host process calls :func:`init_distributed` at startup;
- `jax.devices()` then spans *all* hosts; meshes built over it put DCN
  between processes and ICI within them;
- per-host ray batches are assembled into one global array with
  :func:`global_ray_batch` (each process contributes its local shard — no
  host ever materializes the full batch);
- the existing `shard_map` steps (`parallel/shard.py`) run unchanged: XLA
  inserts cross-host collectives for the `psum`s.

Run a 2-process CPU-backend smoke test via ``tools/dist_worker.py`` (the only
supported multi-process entry: it calls ``jax.distributed.initialize`` BEFORE
importing this package, which would otherwise initialize the XLA backend too
early; used by ``tests/test_distributed.py``).  On real pods the same entry
points are driven by the launcher (one process per host).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import DP_AXIS, SP_AXIS


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> dict:
    """Initialize the JAX distributed runtime for this process.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``), matching how pod launchers
    inject topology.  No-ops (returning the single-process view) when neither
    arguments nor env vars request a multi-process run.

    Returns {"process_id", "num_processes", "local_devices", "global_devices"}.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:  # private API; best-effort already-initialized probe (ADVICE r2)
        from jax._src.distributed import global_state

        already_up = global_state.client is not None
    except (ImportError, AttributeError):
        # Do NOT probe via jax.process_count(): it initializes the XLA
        # backend — the exact pre-initialize hazard this module exists to
        # avoid (ADVICE r3).  Assume not-up and rely on initialize()'s
        # "already initialized" RuntimeError catch below.
        already_up = False
    if coordinator_address and (num_processes or 0) > 1 and not already_up:
        # must run before anything touches the XLA backend — launchers that
        # import this package first should use tools/dist_worker.py, which
        # initializes the runtime before the package import
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            )
        except RuntimeError as e:  # redundant initialize on a live runtime
            if "already initialized" not in str(e):
                raise
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def make_global_mesh(sp: int | None = None):
    """(dp, sp) mesh over ALL processes' devices, process-contiguous on dp.

    `jax.devices()` orders devices process-major, so reshaping (dp, sp) keeps
    each process's devices adjacent on the dp axis: the sp-axis `psum` (sample
    reduction, every pass) rides intra-host ICI, and only the once-per-step
    gradient allreduce crosses DCN — the layout SURVEY §5 calls for.
    """
    from .mesh import make_mesh

    return make_mesh(sp=sp)


def global_ray_batch(mesh, local_arrays, spec=None):
    """Assemble per-process local ray shards into global sharded arrays.

    ``local_arrays``: pytree of np/jnp arrays holding THIS process's rows of
    the sample-major (S, B, ...) batch — each process contributes
    ``B_global * S_global / num_processes`` lanes.  Returns the pytree as
    global `jax.Array`s sharded (sp, dp) over the mesh without any host ever
    holding the full batch (`jax.make_array_from_process_local_data`).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec if spec is not None else P(SP_AXIS, DP_AXIS)
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_arrays,
    )


def _selftest() -> None:
    """2-process CPU-mesh smoke test: sharded render + train step across DCN.

    Each process runs 2 virtual CPU devices (4 global). Asserts the sharded
    render matches a single-device replay and gradients psum to finite,
    process-identical values.
    """
    info = init_distributed()
    assert info["num_processes"] == 2, info
    assert len(info["global_devices"]) == 4, info

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from ..models import sphere_scene
    from ..models.camera import pixel_grid_rays
    from ..ops.shading import N_UNIFORMS
    from ..render import draw_uniforms
    from ..render.pathtracer import MAX_BOUNCES
    from .shard import sharded_render, sharded_train_step

    mesh = make_global_mesh(sp=1)  # (dp=4, sp=1): dp crosses the process edge

    scene, cam = sphere_scene(depth=3)
    s, w, h = 1, 8, 4  # B=32 lanes, 8 per device
    origins, dirs = pixel_grid_rays(cam, w, h)
    b = origins.shape[0]
    u_full = draw_uniforms(jax.random.PRNGKey(0), s * b).reshape(
        s, b, MAX_BOUNCES, N_UNIFORMS
    )

    # each process contributes its half of the lane axis
    pid, b_loc = info["process_id"], b // 2
    rows = slice(pid * b_loc, (pid + 1) * b_loc)
    o_g, d_g, u_g = global_ray_batch(
        mesh,
        (
            np.asarray(origins)[None, rows],
            np.asarray(dirs)[None, rows],
            np.asarray(u_full)[:, rows],
        ),
    )

    rad = sharded_render(mesh, scene, o_g, d_g, u_g)

    # per-process comparison against an unsharded local replay of ALL lanes
    from ..render import trace_paths

    ref = np.asarray(trace_paths(scene, origins, dirs, u_full[0]))
    local = multihost_utils.process_allgather(rad, tiled=True)
    np.testing.assert_allclose(np.asarray(local), ref, rtol=1e-5, atol=1e-6)

    params = {"atlas": scene.atlas, "emittance": scene.materials.emittance}
    target = global_ray_batch(mesh, np.zeros((s, b_loc, 3), np.float32))
    loss, grads = sharded_train_step(mesh, scene, params, o_g, d_g, u_g, target)
    loss = float(loss)
    assert np.isfinite(loss), loss
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    gnorm = float(sum(float(jnp.sum(jnp.abs(g))) for g in leaves))
    assert gnorm > 0.0, "gradients vanished across the process boundary"
    print(f"SELFTEST_OK pid={pid} loss={loss:.6f} gnorm={gnorm:.4f}")


if __name__ == "__main__":
    import sys

    if "--selftest" in sys.argv:
        _selftest()
    else:
        print(init_distributed())

"""Progressive renderer driver — the TPU-native TileRenderer.

The reference's render thread cuts the image into tiles over a rayon pool and
keeps a progressive running average ``fb = (fb*spp + new)/(spp + branch)``
(``/root/reference/src/renderer/tile_renderer.rs:398-413, 684-734``) with a
branch-count warmup schedule (``:196-206``).  Here the whole frame is one
jitted device step: ray-gen with per-pass jitter, wavefront path trace, and
the same running-average update on a device-resident framebuffer.  "Tiles"
are unnecessary — the lane batch is the parallelism axis, sharded over chips
by ``parallel/``.

The async frame-in-flight protocol (``renderer_trait.rs:37-46``) maps to JAX
dispatch: ``render_pass`` returns immediately with device futures; calling
``.block_until_ready()`` is ``FrameInFlight::wait_for``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera, pixel_grid_rays
from ..models.scene import Scene
from ..ops.texture import float_to_u8
from .pathtracer import MAX_BOUNCES, draw_uniforms, trace_paths, trace_paths_branched


def branch_schedule(current_spp: int, branch_count: int) -> int:
    """Branch-count warmup (``tile_renderer.rs:196-206``): start with single
    samples, then ramp so spp lands on a multiple of branch_count."""
    if current_spp < branch_count:
        if current_spp <= int(np.sqrt(branch_count)):
            return 1
        return branch_count - current_spp
    return branch_count


@partial(jax.jit, static_argnames=("width", "height", "n_bounces"))
def render_pass(
    scene: Scene,
    camera: Camera,
    framebuffer: jnp.ndarray,
    current_spp: jnp.ndarray,
    key: jnp.ndarray,
    width: int,
    height: int,
    spp_this_pass,
    n_bounces: int = MAX_BOUNCES,
):
    """One progressive pass: ``spp_this_pass`` jittered samples per pixel,
    folded into the running average.  Returns (framebuffer, new_spp).

    ``spp_this_pass`` is a *dynamic* count (``fori_loop``), so the branch
    warmup schedule — which emits a different sample count nearly every pass
    (``tile_renderer.rs:196-206``) — reuses one compiled executable instead
    of recompiling per distinct count.
    """
    n_px = width * height
    dim = float(max(width, height))

    def body(s, acc):
        k_jit, k_path = jax.random.split(jax.random.fold_in(key, s))
        jitter = jax.random.uniform(
            k_jit, (n_px, 2), minval=-1.0 / dim, maxval=1.0 / dim
        )
        origins, dirs = pixel_grid_rays(camera, width, height, jitter)
        u = draw_uniforms(k_path, n_px, n_bounces)
        # skip_dead: forward-only rendering — dead tiles skip the whole
        # bounce body (9% on the depth-9 bench scene, tools/PERF_NOTES r3)
        return acc + trace_paths(scene, origins, dirs, u, skip_dead=True)

    new_color = jax.lax.fori_loop(
        0, spp_this_pass, body, jnp.zeros((n_px, 3), jnp.float32)
    )

    spp_f = current_spp.astype(jnp.float32)
    s_inv = 1.0 / (spp_f + spp_this_pass)
    fb = (framebuffer * spp_f[..., None] + new_color.reshape(height, width, 3)) * s_inv[
        ..., None
    ]
    return fb, current_spp + spp_this_pass


@partial(jax.jit, static_argnames=("width", "height", "branches", "n_bounces"))
def render_pass_branched(
    scene: Scene,
    camera: Camera,
    framebuffer: jnp.ndarray,
    current_spp: jnp.ndarray,
    key: jnp.ndarray,
    width: int,
    height: int,
    branches: int,
    n_bounces: int = MAX_BOUNCES,
):
    """One progressive pass with first-hit branch replication
    (``path_tracer.rs:66-121``): each pixel traces ONE jittered primary ray
    and ``branches`` continuations from the frozen first hit, contributing
    ``branches`` samples to the running average.  ``branches`` is static —
    the warmup schedule emits at most 3 distinct values per render
    (1, ramp, branch_count), so compile count stays bounded.
    """
    n_px = width * height
    dim = float(max(width, height))
    k_jit, k_path = jax.random.split(key)
    jitter = jax.random.uniform(
        k_jit, (n_px, 2), minval=-1.0 / dim, maxval=1.0 / dim
    )
    origins, dirs = pixel_grid_rays(camera, width, height, jitter)
    u = draw_uniforms(k_path, n_px * branches, n_bounces).reshape(
        n_px, branches, n_bounces, -1
    )
    new_color = trace_paths_branched(scene, origins, dirs, u) * branches

    spp_f = current_spp.astype(jnp.float32)
    s_inv = 1.0 / (spp_f + branches)
    fb = (framebuffer * spp_f[..., None] + new_color.reshape(height, width, 3)) * s_inv[
        ..., None
    ]
    return fb, current_spp + branches


@dataclasses.dataclass
class Renderer:
    """Progressive path-traced renderer with TileRenderer-style controls.

    Control surface mirrors ``RendererMessage`` {Reset, ChangeSpp, Pause}
    (``tile_renderer.rs:30-37``) as plain methods — host orchestration is
    single-threaded Python; the device pipeline is async via JAX dispatch.
    """

    scene: Scene
    camera: Camera
    width: int
    height: int
    target_spp: int = 64
    branch_count: int = 10  # tile_renderer.rs:104
    seed: int = 0
    n_bounces: int = MAX_BOUNCES  # path depth cap (config 5 uses 8)

    def __post_init__(self):
        self.reset()

    # --- RendererMessage equivalents ---
    def reset(self):
        self.framebuffer = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.current_spp = jnp.zeros((), jnp.int32)
        self._pass_index = 0

    def set_target_spp(self, spp: int):
        self.target_spp = spp

    def set_camera(self, camera: Camera):
        self.camera = camera
        self.reset()

    @property
    def spp(self) -> int:
        return int(self.current_spp)

    # --- render loop ---
    def step(self) -> bool:
        """Run one progressive pass; returns False once target_spp reached.

        The returned arrays are device futures — this call does not block on
        the device (FrameInFlight::poll semantics)."""
        spp_now = self.spp
        if spp_now >= self.target_spp:
            return False
        n = min(branch_schedule(spp_now, self.branch_count), self.target_spp - spp_now)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self._pass_index)
        if n > 1:
            # sample-reuse pass: one primary, n branch continuations
            self.framebuffer, self.current_spp = render_pass_branched(
                self.scene,
                self.camera,
                self.framebuffer,
                self.current_spp,
                key,
                self.width,
                self.height,
                n,
                self.n_bounces,
            )
        else:
            self.framebuffer, self.current_spp = render_pass(
                self.scene,
                self.camera,
                self.framebuffer,
                self.current_spp,
                key,
                self.width,
                self.height,
                n,
                self.n_bounces,
            )
        self._pass_index += 1
        return True

    def render(self, passes: int | None = None):
        """Drive passes until target spp (or ``passes`` limit); returns the
        linear float framebuffer."""
        count = 0
        while self.step():
            count += 1
            if passes is not None and count >= passes:
                break
        return self.framebuffer

    def get_image(self) -> np.ndarray:
        """Gamma-compressed u8 frame (``tile_renderer.rs:641-645``)."""
        return float_to_u8(np.asarray(self.framebuffer))

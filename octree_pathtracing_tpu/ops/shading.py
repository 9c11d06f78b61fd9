"""BRDF sampling building blocks — batched, fixed-uniform-slot versions of the
reference's ray scattering math (``/root/reference/src/ray/mod.rs``).

All samplers consume uniforms from explicit slots of a pre-drawn ``(B, NU)``
block instead of a stateful RNG, so renders are bit-reproducible across
sharding layouts and the NumPy oracle can consume the identical stream
(SURVEY.md §7.1).

Uniform slot map (per lane, per bounce):

====  =======================================
slot  use
====  =======================================
0     metal lobe choice
1     specular lobe choice
2     diffuse lobe choice
3     Fresnel reflect choice
4,5   x1, x2 — cosine/perturbation sample
6     sun importance-sample chance
7     subsurface-scatter chance
8-15  4 redraw pairs (shallow-angle rejection)
16,17 sun-cone NEE sample
18    emitter pick (EmitterSampling.ONE)
19,20 emitter surface-point sample
====  =======================================
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.sun import Sun, MAX_IMPORTANCE_SAMPLE_CHANCE

PI = np.pi
EPSILON = 5e-8  # Ray::EPSILON (ray/mod.rs:26)
OFFSET = 1e-6  # Ray::OFFSET (ray/mod.rs:27)

N_UNIFORMS = 21
U_METAL, U_SPECULAR, U_DIFFUSE, U_FRESNEL = 0, 1, 2, 3
U_X1, U_X2 = 4, 5
U_IMPORTANCE, U_SUBSURFACE = 6, 7
U_REDRAW0 = 8  # 4 pairs: 8..15
U_SUN1, U_SUN2 = 16, 17
U_EM_PICK, U_EM1, U_EM2 = 18, 19, 20


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def tangent_frame_spec(n):
    """Frame used by specular/scatter sampling (``ray/mod.rs:151-160``):
    tangent = (0,1,0) if |n.x|>0.1 else (1,0,0); u = tangent x n (normalized);
    v = n x u.  Returns (u, v)."""
    t = jnp.where(
        (jnp.abs(n[:, 0]) > 0.1)[:, None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32)[None],
        jnp.array([1.0, 0.0, 0.0], jnp.float32)[None],
    )
    u = jnp.cross(t, n)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    v = jnp.cross(n, u)
    return u, v


def tangent_frame_diffuse(n):
    """Frame used by diffuse_reflection (``ray/mod.rs:326-353``):
    x = (0,1,0) if |n.x|>0.1 else (1,0,0); u = x cross n (normalized);
    v = u cross n."""
    x = jnp.where(
        (jnp.abs(n[:, 0]) > 0.1)[:, None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32)[None],
        jnp.array([1.0, 0.0, 0.0], jnp.float32)[None],
    )
    u = jnp.cross(x, n)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    v = jnp.cross(u, n)
    return u, v


def _opposite_side_correction(new_dir, n, d_in):
    """Nudge ``new_dir`` to the opposite side of ``n`` from ``d_in``
    (``ray/mod.rs:175-181`` / ``:367-372``)."""
    same = jnp.sign(_dot(n, new_dir)) == jnp.sign(_dot(n, d_in))
    factor = jnp.sign(_dot(n, d_in)) * (-EPSILON) - _dot(new_dir, n)
    fixed = new_dir + factor[:, None] * n
    fixed = fixed / jnp.linalg.norm(fixed, axis=-1, keepdims=True)
    return jnp.where(same[:, None], fixed, new_dir)


def specular_reflect_dir(d_in, n, roughness, u):
    """Mirror direction lerped with a cosine-lobe perturbation by roughness
    (``ray/mod.rs:113-184``).  Returns unit directions."""
    mirror = d_in - 2.0 * _dot(d_in, n)[:, None] * n
    x1 = u[:, U_X1]
    x2 = u[:, U_X2]
    r = jnp.sqrt(x1)
    theta = 2.0 * PI * x2
    tx, ty, tz = r * jnp.cos(theta), r * jnp.sin(theta), jnp.sqrt(1.0 - x1)
    tu, tv = tangent_frame_spec(n)
    lobe = tu * tx[:, None] + tv * ty[:, None] + n * tz[:, None]
    rough = roughness[:, None]
    blended = lobe * rough + mirror * (1.0 - rough)
    blended = blended / jnp.linalg.norm(blended, axis=-1, keepdims=True)
    out = jnp.where(roughness[:, None] > EPSILON, blended, mirror)
    return _opposite_side_correction(out, n, d_in)


def diffuse_dir_and_weight(n, sun: Sun, u, importance_sampling: bool):
    """Cosine-hemisphere sample, optionally warped toward the sun cap with
    throughput reweighting (``ray/mod.rs:211-373``).

    Returns (dir (B,3), weight (B,)) where weight multiplies the lane's
    albedo/throughput (1.0 when no warp applies).

    Deviation note: the reference computes the reweight into ``ray.hit.color``
    but then uses a pre-reweight copy in the accumulation
    (``path_tracer.rs:293-313``), silently discarding it; we apply the weight,
    which is the evidently-intended importance-sampling estimator.
    """
    x1 = u[:, U_X1]
    x2 = u[:, U_X2]
    r = jnp.sqrt(x1)
    theta = 2.0 * PI * x2
    tx = r * jnp.cos(theta)
    ty = r * jnp.sin(theta)
    weight = jnp.ones_like(x1)

    if importance_sampling:
        sun_alt_f = sun.altitude
        sun_alt = jnp.where(
            jnp.abs(sun_alt_f) > PI / 2.0, jnp.sign(sun_alt_f) * PI - sun_alt_f, sun_alt_f
        )
        sun_az = sun.azimuth
        sun_d = jnp.stack(
            [
                jnp.cos(sun_az) * jnp.cos(sun_alt),
                jnp.sin(sun_alt),
                jnp.sin(sun_az) * jnp.cos(sun_alt),
            ]
        )
        nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
        sdx, sdy, sdz = sun_d[0], sun_d[1], sun_d[2]
        sun_tz = sdx * nx + sdy * ny + sdz * nz
        big_x = jnp.abs(nx) > 0.1
        sun_tx = jnp.where(big_x, sdx * nz - sdz * nx, sdz * ny - sdy * nz)
        sun_ty = jnp.where(
            big_x,
            sdx * nx * ny - sdy * (nx * nx + nz * nz) + sdz * ny * nz,
            sdy * nx * ny - sdx * (ny * ny + nz * nz) + sdz * nx * nz,
        )
        hyp = jnp.where(big_x, jnp.hypot(nx, nz), jnp.hypot(nz, ny))
        sun_tx = sun_tx / hyp
        sun_ty = sun_ty / hyp

        cr = sun.radius * sun.importance_sample_radius
        chance = sun.importance_sample_chance
        sun_alt_rel = jnp.arcsin(jnp.clip(sun_tz, -1.0, 1.0))
        visible = sun_alt_rel + cr > EPSILON
        cap_inside = jnp.hypot(sun_tx, sun_ty) + cr + EPSILON < 1.0

        # --- circular-cap case (ray/mod.rs:265-286) ---
        take_cap = u[:, U_IMPORTANCE] < chance
        cap_tx = sun_tx + tx * cr
        cap_ty = sun_ty + ty * cr
        cap_w = cr * cr / chance
        # deterministic remap out of the cap (bounded fixpoint of :274-282)
        otx, oty = tx, ty
        for _ in range(8):
            inside = jnp.hypot(otx - sun_tx, oty - sun_ty) < cr
            ntx = (otx - sun_tx) / cr
            nty = (oty - sun_ty) / cr
            otx = jnp.where(inside, ntx, otx)
            oty = jnp.where(inside, nty, oty)
        out_w = (1.0 - cr * cr) / (1.0 - chance)

        cap_sel_tx = jnp.where(take_cap, cap_tx, otx)
        cap_sel_ty = jnp.where(take_cap, cap_ty, oty)
        cap_sel_w = jnp.where(take_cap, cap_w, out_w)

        # --- shallow-angle annular segment (ray/mod.rs:288-320) ---
        min_r = jnp.cos(sun_alt_rel + cr)
        max_r = jnp.cos(jnp.maximum(sun_alt_rel - cr, 0.0))
        sun_theta = jnp.arctan2(sun_ty, sun_tx)
        seg = ((max_r * max_r - min_r * min_r) * cr) / PI
        s_chance = jnp.minimum(
            chance * seg / (cr * cr), MAX_IMPORTANCE_SAMPLE_CHANCE
        )
        take_seg = u[:, U_IMPORTANCE] < s_chance
        seg_r = jnp.sqrt(min_r * min_r * x1 + max_r * max_r * (1.0 - x1))
        seg_theta = sun_theta + (2.0 * x2 - 1.0) * cr
        seg_tx = seg_r * jnp.cos(seg_theta)
        seg_ty = seg_r * jnp.sin(seg_theta)
        seg_w = seg / s_chance
        # rejection with fresh redraw pairs (ray/mod.rs:307-317)
        rr, rtheta_ = r, theta

        def ang_dist(a, b):
            diff = jnp.abs(a - b) % (2.0 * PI)
            return jnp.where(diff > PI, 2.0 * PI - diff, diff)

        for k in range(4):
            bad = (rr > min_r) & (rr < max_r) & (ang_dist(rtheta_, sun_theta) < cr)
            nx1 = u[:, U_REDRAW0 + 2 * k]
            nx2 = u[:, U_REDRAW0 + 2 * k + 1]
            rr = jnp.where(bad, jnp.sqrt(nx1), rr)
            rtheta_ = jnp.where(bad, 2.0 * PI * nx2, rtheta_)
        rej_tx = rr * jnp.cos(rtheta_)
        rej_ty = rr * jnp.sin(rtheta_)
        rej_w = (1.0 - seg) / (1.0 - s_chance)

        seg_sel_tx = jnp.where(take_seg, seg_tx, rej_tx)
        seg_sel_ty = jnp.where(take_seg, seg_ty, rej_ty)
        seg_sel_w = jnp.where(take_seg, seg_w, rej_w)

        w_tx = jnp.where(cap_inside, cap_sel_tx, seg_sel_tx)
        w_ty = jnp.where(cap_inside, cap_sel_ty, seg_sel_ty)
        w_w = jnp.where(cap_inside, cap_sel_w, seg_sel_w)

        tx = jnp.where(visible, w_tx, tx)
        ty = jnp.where(visible, w_ty, ty)
        weight = jnp.where(visible, w_w, weight)

    tz = jnp.sqrt(jnp.maximum(1.0 - tx * tx - ty * ty, 0.0))
    tu, tv = tangent_frame_diffuse(n)
    d = tu * tx[:, None] + tv * ty[:, None] + n * tz[:, None]
    return d, weight


def refract_dir(d_in, n, ior_ratio, cos_theta, radicand):
    """Snell refraction direction (``path_tracer.rs:371-394``)."""
    t2 = jnp.sqrt(jnp.maximum(radicand, 0.0))
    pos = ior_ratio[:, None] * d_in + (ior_ratio * cos_theta - t2)[:, None] * n
    neg = ior_ratio[:, None] * d_in - (-ior_ratio * cos_theta - t2)[:, None] * n
    out = jnp.where(cos_theta[:, None] > 0.0, pos, neg)
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return _opposite_side_correction(out, n, d_in)


def fresnel_schlick(ior1, ior2, cos_theta):
    """Schlick reflectance (``path_tracer.rs:356-361``)."""
    ratio = ior1 / ior2
    a = ratio - 1.0
    b = ratio + 1.0
    r0 = (a * a) / (b * b)
    c = 1.0 - cos_theta
    return r0 + (1.0 - r0) * c**5

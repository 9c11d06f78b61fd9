"""Scalar NumPy path-tracing oracle — the trusted spec for the wavefront kernel.

Independently re-implements the reference integrator semantics
(``/root/reference/src/ray/path_tracer.rs`` + ``src/ray/mod.rs`` +
``src/scene/mod.rs``) one ray at a time in plain numpy, consuming the same
pre-drawn ``(MAX_BOUNCES, N_UNIFORMS)`` uniform block and slot map as
``render/pathtracer.py``.  Parity tests drive both on identical lanes and
require allclose radiance.  Deviations from the reference Rust are the ones
documented in ``render/pathtracer.py`` (intended-math readings of WIP code).
"""

from __future__ import annotations

import numpy as np

from ..octree.traversal_ref import traverse_oracle
from ..ops.shading import (
    EPSILON,
    OFFSET,
    U_DIFFUSE,
    U_FRESNEL,
    U_IMPORTANCE,
    U_METAL,
    U_REDRAW0,
    U_SPECULAR,
    U_SUBSURFACE,
    U_SUN1,
    U_SUN2,
    U_X1,
    U_X2,
)
from ..models.materials import FLAG_REFRACTIVE, FLAG_SUBSURFACE_SCATTER
from ..models.scene import EmitterSampling

MAX_BOUNCES = 5
MAX_IMPORTANCE_SAMPLE_CHANCE = 0.9
SHADOW_MAX_SURFACES = 4
PI = np.pi

_FACE_NORMALS = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]], np.float64
)


def scene_to_numpy(scene):
    """Snapshot a jax Scene into plain numpy for the oracle.

    Brick-leaf pools are exploded back to the plain layout they effectively
    traverse (``octree.brick.debrickify``) so the scalar reference walks the
    same voxelization the device kernel does."""
    from ..octree.brick import BrickOctree, debrickify

    from ..ops.texture import Atlas

    tree = scene.octree
    if isinstance(tree, BrickOctree):
        tree = debrickify(tree)
    m = scene.materials
    if isinstance(scene.atlas, Atlas):
        atlas_np = np.asarray(scene.atlas.data, np.float64)
        atlas_sizes = np.asarray(scene.atlas.sizes)
    else:
        atlas_np = np.asarray(scene.atlas, np.float64)
        atlas_sizes = None
    return dict(
        child_mask=np.asarray(tree.child_mask),
        child_data=np.asarray(tree.child_data),
        root=tree.root,
        octree_scale=tree.scale(),
        atlas=atlas_np,
        atlas_sizes=atlas_sizes,
        leaf_material=np.asarray(scene.leaf_material),
        ior=np.asarray(m.ior, np.float64),
        specular=np.asarray(m.specular, np.float64),
        emittance=np.asarray(m.emittance, np.float64),
        roughness=np.asarray(m.roughness, np.float64),
        metalness=np.asarray(m.metalness, np.float64),
        flags=np.asarray(m.flags),
        texture_index=np.asarray(m.texture_index),
        sun_sw=np.asarray(scene.sun.sw, np.float64),
        sun_su=np.asarray(scene.sun.su, np.float64),
        sun_sv=np.asarray(scene.sun.sv, np.float64),
        sun_radius=float(scene.sun.radius),
        sun_radius_cos=float(scene.sun.radius_cos),
        sun_color=np.asarray(scene.sun.color, np.float64),
        sun_luminosity=float(scene.sun.luminosity),
        sun_emittance=np.asarray(scene.sun.emittance, np.float64),
        sun_apparent=np.asarray(scene.sun.apparent_texture_brightness, np.float64),
        sun_azimuth=float(scene.sun.azimuth),
        sun_altitude=float(scene.sun.altitude),
        sun_chance=float(scene.sun.importance_sample_chance),
        sun_imp_radius=float(scene.sun.importance_sample_radius),
        sun_draw_texture=scene.sun.draw_texture,
        strat=scene.sun_sampling,
        emitter_sampling=scene.emitter_sampling,
        emitters_enabled=scene.emitters_enabled,
        f_sub_surface=float(scene.f_sub_surface),
        prims=_prims_np(scene),
        emitters=_emitters_np(scene),
    )


def _prims_np(scene):
    if scene.prims is None:
        return None
    from ..models.prims import prims_to_numpy

    return prims_to_numpy(scene.prims)


def _emitters_np(scene):
    if getattr(scene, "emitters", None) is None:
        return None
    em = scene.emitters
    out = dict(
        pos=np.asarray(em.pos, np.float64),
        size=np.asarray(em.size, np.float64),
        mat=np.asarray(em.mat, np.int64),
        grid_idx=None,
    )
    if getattr(em, "grid_idx", None) is not None:
        out.update(
            grid_idx=np.asarray(em.grid_idx, np.int64),
            grid_w=np.asarray(em.grid_w, np.float32),
            grid_bits=int(em.grid_bits),
            cell_size=float(em.cell_size),
            lam=float(em.lam),
        )
    return out


def _prim_merge(sc, origin, direction, h):
    """Merge the octree traversal hit with the nearest analytic primitive
    (mirrors ``render/pathtracer.py::_shade``).  Returns
    (hit, mat, u, v, normal, t_world) with octree leaves resolved to
    materials."""
    oct_hit = bool(h.hit)
    t_oct = h.t / sc["octree_scale"] if oct_hit else np.inf
    if oct_hit:
        mat = _mat_of_leaf(sc, h.leaf_value)
        n = _FACE_NORMALS[h.face_id]
        uu, vv, t_world = h.u, h.v, t_oct
    else:
        mat, n, uu, vv, t_world = 0, np.zeros(3), 0.0, 0.0, np.inf
    if sc.get("prims") is not None:
        from ..models.prims import intersect_prims_np

        p_hit, p_t, p_mat, p_uv, p_n = intersect_prims_np(
            sc["prims"], origin, direction, t_max=1024.0
        )
        if p_hit and p_t < t_oct:
            return True, p_mat, p_uv[0], p_uv[1], p_n, p_t
    return oct_hit, mat, uu, vv, n, t_world


def _sample_atlas(sc, layer, u, v):
    atlas = sc["atlas"]
    if sc.get("atlas_sizes") is not None:
        th, tw = (int(x) for x in sc["atlas_sizes"][int(layer)])
    else:
        th, tw = atlas.shape[1], atlas.shape[2]
    uu = min(max(u, 0.0), 1.0)
    vv = 1.0 - min(max(v, 0.0), 1.0)
    i = min(int(uu * tw), tw - 1)
    j = min(int(vv * th), th - 1)
    return atlas[layer, j, i].copy()


def _mat_of_leaf(sc, leaf):
    lm = sc["leaf_material"]
    return int(lm[min(int(leaf), len(lm) - 1)])


def _alpha_accept(sc):
    """Texel alpha test — the reference's Cuboid::intersect_texture gate
    (cuboid.rs:73-90); a failing candidate falls through to ADVANCE.  (The
    path-level null-material skip of path_tracer.rs:52-54 is subsumed: a hit
    always has alpha > eps, so alpha+specular < eps can never fire.)"""

    def accept(leaf, face, u, v, t):
        mat = _mat_of_leaf(sc, leaf)
        alpha = _sample_atlas(sc, sc["texture_index"][mat], u, v)[3]
        return alpha > EPSILON

    return accept


def _trace(sc, origin, direction, cur_mat):
    return traverse_oracle(
        sc["child_mask"],
        sc["child_data"],
        sc["root"],
        sc["octree_scale"],
        origin,
        direction,
        max_dst=1024.0,
        accept_fn=_alpha_accept(sc),
    )


def _sun_window(sc, d):
    """(in_disk, rgb_add_specular, rgb_add_diffuse)."""
    sw, su, sv = sc["sun_sw"], sc["sun_su"], sc["sun_sv"]
    if np.dot(d, sw) < 0.5:
        return False
    width = sc["sun_radius"] * 4.0
    width2 = width * 2.0
    a = PI / 2.0 - np.arccos(np.clip(np.dot(d, su), -1, 1)) + width
    if not (0.0 <= a < width2):
        return False
    b = PI / 2.0 - np.arccos(np.clip(np.dot(d, sv), -1, 1)) + width
    return 0.0 <= b < width2


def _sky(sc, d, kind):
    """kind: 'specular' (draw sun, x10 apparent), 'diffuse' (luminosity), 'plain'."""
    rgb = np.array([0.5, 0.7, 1.0])
    if kind == "specular" and sc["sun_draw_texture"] and _sun_window(sc, d):
        rgb = rgb + sc["sun_apparent"] * 10.0
    elif kind == "diffuse" and _sun_window(sc, d):
        rgb = rgb + sc["sun_color"][:3] * 10.0 * sc["sun_luminosity"]
    return rgb


def _tangent_frame_spec(n):
    t = np.array([0.0, 1.0, 0.0]) if abs(n[0]) > 0.1 else np.array([1.0, 0.0, 0.0])
    u = np.cross(t, n)
    u = u / np.linalg.norm(u)
    v = np.cross(n, u)
    return u, v


def _tangent_frame_diffuse(n):
    x = np.array([0.0, 1.0, 0.0]) if abs(n[0]) > 0.1 else np.array([1.0, 0.0, 0.0])
    u = np.cross(x, n)
    u = u / np.linalg.norm(u)
    v = np.cross(u, n)
    return u, v


def _opposite_side(new_dir, n, d_in):
    if np.sign(np.dot(n, new_dir)) == np.sign(np.dot(n, d_in)):
        factor = np.sign(np.dot(n, d_in)) * (-EPSILON) - np.dot(new_dir, n)
        new_dir = new_dir + factor * n
        new_dir = new_dir / np.linalg.norm(new_dir)
    return new_dir


def _specular_dir(d_in, n, rough, u):
    mirror = d_in - 2.0 * np.dot(d_in, n) * n
    if rough > EPSILON:
        x1, x2 = u[U_X1], u[U_X2]
        r = np.sqrt(x1)
        th = 2.0 * PI * x2
        tu, tv = _tangent_frame_spec(n)
        lobe = tu * (r * np.cos(th)) + tv * (r * np.sin(th)) + n * np.sqrt(1.0 - x1)
        out = lobe * rough + mirror * (1.0 - rough)
        out = out / np.linalg.norm(out)
    else:
        out = mirror
    return _opposite_side(out, n, d_in)


def _angle_distance(a, b):
    diff = abs(a - b) % (2.0 * PI)
    return 2.0 * PI - diff if diff > PI else diff


def _diffuse_dir(sc, n, u, importance):
    x1, x2 = u[U_X1], u[U_X2]
    r = np.sqrt(x1)
    theta = 2.0 * PI * x2
    tx = r * np.cos(theta)
    ty = r * np.sin(theta)
    weight = 1.0

    if importance:
        alt_f = sc["sun_altitude"]
        alt = np.sign(alt_f) * PI - alt_f if abs(alt_f) > PI / 2.0 else alt_f
        az = sc["sun_azimuth"]
        sd = np.array([np.cos(az) * np.cos(alt), np.sin(alt), np.sin(az) * np.cos(alt)])
        nx, ny, nz = n
        sun_tz = float(sd @ n)
        if abs(nx) > 0.1:
            sun_tx = sd[0] * nz - sd[2] * nx
            sun_ty = sd[0] * nx * ny - sd[1] * (nx * nx + nz * nz) + sd[2] * ny * nz
            hyp = np.hypot(nx, nz)
        else:
            sun_tx = sd[2] * ny - sd[1] * nz
            sun_ty = sd[1] * nx * ny - sd[0] * (ny * ny + nz * nz) + sd[2] * nx * nz
            hyp = np.hypot(nz, ny)
        sun_tx /= hyp
        sun_ty /= hyp

        cr = sc["sun_radius"] * sc["sun_imp_radius"]
        chance = sc["sun_chance"]
        alt_rel = np.arcsin(np.clip(sun_tz, -1, 1))
        if alt_rel + cr > EPSILON:
            if np.hypot(sun_tx, sun_ty) + cr + EPSILON < 1.0:
                if u[U_IMPORTANCE] < chance:
                    tx = sun_tx + tx * cr
                    ty = sun_ty + ty * cr
                    weight = cr * cr / chance
                else:
                    for _ in range(8):
                        if np.hypot(tx - sun_tx, ty - sun_ty) < cr:
                            tx = (tx - sun_tx) / cr
                            ty = (ty - sun_ty) / cr
                        else:
                            break
                    weight = (1.0 - cr * cr) / (1.0 - chance)
            else:
                min_r = np.cos(alt_rel + cr)
                max_r = np.cos(max(alt_rel - cr, 0.0))
                sun_theta = np.arctan2(sun_ty, sun_tx)
                seg = ((max_r * max_r - min_r * min_r) * cr) / PI
                s_chance = min(chance * seg / (cr * cr), MAX_IMPORTANCE_SAMPLE_CHANCE)
                if u[U_IMPORTANCE] < s_chance:
                    sr = np.sqrt(min_r * min_r * x1 + max_r * max_r * (1.0 - x1))
                    st = sun_theta + (2.0 * x2 - 1.0) * cr
                    tx = sr * np.cos(st)
                    ty = sr * np.sin(st)
                    weight = seg / s_chance
                else:
                    rr, rt = r, theta
                    for k in range(4):
                        if (
                            (rr > min_r)
                            and (rr < max_r)
                            and (_angle_distance(rt, sun_theta) < cr)
                        ):
                            rr = np.sqrt(u[U_REDRAW0 + 2 * k])
                            rt = 2.0 * PI * u[U_REDRAW0 + 2 * k + 1]
                        else:
                            break
                    tx = rr * np.cos(rt)
                    ty = rr * np.sin(rt)
                    weight = (1.0 - seg) / (1.0 - s_chance)

    tz = np.sqrt(max(1.0 - tx * tx - ty * ty, 0.0))
    tu, tv = _tangent_frame_diffuse(n)
    return tu * tx + tv * ty + n * tz, weight


def _sun_cone_dir(sc, u1, u2):
    cos_a = 1.0 - u1 + u1 * sc["sun_radius_cos"]
    sin_a = np.sqrt(1.0 - cos_a * cos_a)
    phi = 2.0 * PI * u2
    return (
        sc["sun_su"] * (np.cos(phi) * sin_a)
        + sc["sun_sv"] * (np.sin(phi) * sin_a)
        + sc["sun_sw"] * cos_a
    )


def _shadow_attenuation(sc, origin, direction, cur_mat, max_t=None):
    """``max_t``: surfaces at/beyond this world distance (from ``origin``)
    don't attenuate — the emitter-NEE truncation (spec shared with
    ``render/pathtracer.py::shadow_attenuation``)."""
    att = np.ones(4)
    o = origin.copy()
    cm = cur_mat
    dist_so_far = 0.0
    strict = sc["strat"].strict_direct_light
    for _ in range(SHADOW_MAX_SURFACES):
        if att[3] <= 0.0:
            break
        o = o + direction * OFFSET
        dist_so_far += OFFSET
        h = _trace(sc, o, direction, cm)
        if not h.hit:
            break
        t_world = h.t / sc["octree_scale"]
        if max_t is not None and dist_so_far + t_world >= max_t:
            break
        mat = _mat_of_leaf(sc, h.leaf_value)
        albedo = _sample_atlas(sc, sc["texture_index"][mat], h.u, h.v)
        mult = 1.0 - albedo[3]
        att[:3] *= albedo[:3] * albedo[3] + mult
        att[3] *= mult
        if strict and sc["ior"][cm] != sc["ior"][mat]:
            att[3] = 0.0
        o = o + direction * t_world
        dist_so_far += t_world
        cm = mat
    # nearest analytic primitive contributes one factor (spec shared with
    # render/pathtracer.py::shadow_attenuation)
    if sc.get("prims") is not None:
        from ..models.prims import intersect_prims_np

        p_hit, p_t, p_mat, p_uv, _ = intersect_prims_np(
            sc["prims"], origin + direction * OFFSET, direction
        )
        if p_hit and max_t is not None and OFFSET + p_t >= max_t:
            p_hit = False
        if p_hit:
            albedo = _sample_atlas(sc, sc["texture_index"][p_mat], p_uv[0], p_uv[1])
            mult = 1.0 - albedo[3]
            att[:3] *= albedo[:3] * albedo[3] + mult
            new_w = att[3] * mult
            if strict and sc["ior"][cur_mat] != sc["ior"][p_mat]:
                new_w = 0.0
            att[3] = new_w
    return att


def _pick_emitter(em, hitpoint, u_pick):
    """Scalar twin of ``models/emitters._spatial_pick``: supercell mixture
    sampler (lam uniform floor + weighted candidate row) with the exact
    realized pdf via membership; uniform over E when the table has no grid.
    Returns (idx, 1/p_pick)."""
    e = em["pos"].shape[0]
    if em.get("grid_idx") is None:
        return min(int(u_pick * e), e - 1), float(e)
    g = 1 << em["grid_bits"]
    lam = em["lam"]
    cell = np.clip(
        (np.asarray(hitpoint, np.float64) / em["cell_size"]).astype(np.int64),
        0,
        g - 1,
    )
    c = int((cell[0] * g + cell[1]) * g + cell[2])
    gi = em["grid_idx"][c]
    gw = em["grid_w"][c]
    if u_pick < lam:
        uu = min(max(u_pick / lam, 0.0), 1.0 - 1e-7)
        idx = min(int(uu * e), e - 1)
    else:
        us = min(max((u_pick - lam) / (1.0 - lam), 0.0), 1.0 - 1e-7)
        cdf = np.cumsum(gw.astype(np.float32))
        j = min(int(np.sum(np.float32(us) > cdf)), len(gi) - 1)
        idx = int(gi[j])
    w_match = float(gw[gi == idx].sum())
    p = lam / e + (1.0 - lam) * w_match
    return idx, 1.0 / p


def _emitter_nee(sc, hitpoint, n, albedo, u, cur_mat):
    """EmitterSampling.ONE contribution at a diffuse bounce (scalar twin of
    the block in ``render/pathtracer.py::_shade``; estimator spec in
    ``models/emitters.py``).  Returns (3,) radiance (pre-throughput)."""
    from ..ops.shading import U_EM_PICK, U_EM1, U_EM2

    em = sc["emitters"]
    p_cell = np.asarray(hitpoint, np.float64)
    if em.get("grid_idx") is not None:
        # normal-nudged cell lookup (twin of sample_emitter_point's n= arg:
        # wall hitpoints sit exactly on grid-cell boundary planes)
        p_cell = p_cell + (0.01 * em["cell_size"]) * np.asarray(n, np.float64)
    idx, pick_inv = _pick_emitter(em, p_cell, u[U_EM_PICK])
    pos = em["pos"][idx]
    size = em["size"][idx]
    mat_e = int(em["mat"][idx])

    # visible-face importance sampling (twin of models/emitters.py
    # sample_emitter_point: cosine-weighted choice among the 3 near faces)
    center = pos + 0.5 * size
    dpc = np.asarray(hitpoint, np.float64) - center
    dn = max(np.linalg.norm(dpc), 1e-6)
    w = np.abs(dpc) / dn + 1e-6
    csum = np.cumsum(w)
    total = csum[2]
    r = u[U_EM1] * total
    axis = 0 if r < csum[0] else (1 if r < csum[1] else 2)
    w_a = w[axis]
    lo = 0.0 if axis == 0 else csum[axis - 1]
    a = min(max((r - lo) / w_a, 0.0), 1.0)
    b = u[U_EM2]
    hi = 1.0 if dpc[axis] > 0.0 else 0.0
    ax1 = (axis + 1) % 3
    ax2 = (axis + 2) % 3
    q = pos.copy()
    q[axis] += hi * size
    q[ax1] += a * size
    q[ax2] += b * size
    ne = np.zeros(3)
    ne[axis] = 2.0 * hi - 1.0

    inv_pdf = pick_inv * size * size * total / w_a
    return _emitter_point_contrib(
        sc, hitpoint, n, albedo, cur_mat, q, ne, mat_e, a, b, inv_pdf
    )


def _emitter_point_contrib(sc, hitpoint, n, albedo, cur_mat, q, ne, mat_e, a, b,
                           inv_pdf):
    """Area-form NEE contribution of one sampled emitter point (scalar twin
    of ``pathtracer.py::em_face_contrib``)."""
    to_q = q - hitpoint
    dist = np.linalg.norm(to_q)
    if dist < EPSILON:
        return np.zeros(3)
    wi = to_q / dist
    cos_s = float(wi @ n)
    cos_e = float(-wi @ ne)
    if cos_s <= 0.0 or cos_e <= 0.0:
        return np.zeros(3)
    att = _shadow_attenuation(sc, hitpoint, wi, cur_mat, max_t=dist * (1.0 - 1e-3))
    albedo_e = _sample_atlas(sc, sc["texture_index"][mat_e], a, b)
    l_e = albedo_e[:3] * albedo_e[:3] * sc["emittance"][mat_e]
    geom = cos_s * cos_e / max(dist * dist, EPSILON) / PI
    return albedo[:3] * l_e * att[:3] * (geom * inv_pdf * att[3])


def _emitter_block_faces(sc, hitpoint, n, albedo, cur_mat, idx, u1, u2,
                         pick_factor):
    """Sum of the 3 toward-face contributions of emitter block ``idx``
    (scalar twin of the ONE_BLOCK / ALL per-block sum; face enumeration spec
    in ``models/emitters.py::toward_face_sample``)."""
    em = sc["emitters"]
    pos = em["pos"][idx]
    size = em["size"][idx]
    mat_e = int(em["mat"][idx])
    out = np.zeros(3)
    for axis in range(3):
        hi = 1.0 if hitpoint[axis] - (pos[axis] + 0.5 * size) > 0.0 else 0.0
        ax1, ax2 = (axis + 1) % 3, (axis + 2) % 3
        q = np.asarray(pos, np.float64).copy()
        q[axis] += hi * size
        q[ax1] += u1 * size
        q[ax2] += u2 * size
        ne = np.zeros(3)
        ne[axis] = 2.0 * hi - 1.0
        out += _emitter_point_contrib(
            sc, hitpoint, n, albedo, cur_mat, q, ne, mat_e, u1, u2,
            pick_factor * size * size,
        )
    return out


def _emitter_nee_strategy(sc, hitpoint, n, albedo, u, cur_mat):
    """Dispatch the emitter NEE estimator by strategy (scalar twin of the
    ``_shade`` block; ONE_BLOCK/ALL semantics per scene/mod.rs:49-57)."""
    from ..ops.shading import U_EM_PICK, U_EM1, U_EM2

    es = sc["emitter_sampling"]
    if es == EmitterSampling.ONE:
        return _emitter_nee(sc, hitpoint, n, albedo, u, cur_mat)
    e = sc["emitters"]["pos"].shape[0]
    if es == EmitterSampling.ONE_BLOCK:
        idx = min(int(u[U_EM_PICK] * e), e - 1)
        return _emitter_block_faces(
            sc, hitpoint, n, albedo, cur_mat, idx, u[U_EM1], u[U_EM2], float(e)
        )
    out = np.zeros(3)  # ALL: deterministic sum over every block
    for idx in range(e):
        out += _emitter_block_faces(
            sc, hitpoint, n, albedo, cur_mat, idx, u[U_EM1], u[U_EM2], 1.0
        )
    return out


def trace_path_oracle(sc, origin, direction, uniforms):
    """Trace one lane; returns radiance (3,).  ``uniforms``: (n_bounces, N_UNIFORMS)."""
    strat = sc["strat"]
    origin = np.asarray(origin, np.float64).copy()
    d = np.asarray(direction, np.float64).copy()
    throughput = np.ones(3)
    radiance = np.zeros(3)
    specular_flag = True
    cur_mat = 0

    n_bounces = uniforms.shape[0]
    for bounce in range(n_bounces):
        u = uniforms[bounce]
        h = _trace(sc, origin, d, cur_mat)
        any_hit, mat, hu, hv, n, t_world = _prim_merge(sc, origin, d, h)
        if not any_hit:
            if bounce == 0 or specular_flag:
                sky = _sky(sc, d, "specular")
            else:
                sky = _sky(sc, d, "diffuse" if strat.diffuse_sun else "plain")
            radiance += throughput * sky
            break

        if bounce + 1 >= n_bounces:
            break

        albedo = _sample_atlas(sc, sc["texture_index"][mat], hu, hv)
        alpha = albedo[3]
        hitpoint = origin + d * t_world

        metal = sc["metalness"][mat]
        spec = sc["specular"][mat]
        ior1 = sc["ior"][mat]
        ior2 = sc["ior"][cur_mat]

        do_metal = metal > EPSILON and u[U_METAL] < metal
        do_spec = not do_metal and spec > EPSILON and u[U_SPECULAR] < spec
        do_diff = not do_metal and not do_spec and u[U_DIFFUSE] < alpha
        do_refr = (
            not (do_metal or do_spec or do_diff) and abs(ior1 - ior2) >= EPSILON
        )

        if do_metal or do_spec:
            d_new = _specular_dir(d, n, sc["roughness"][mat], u)
            if do_metal:
                throughput = throughput * albedo[:3]
            origin = hitpoint + d_new * OFFSET
            d = d_new
        elif do_diff:
            if (
                sc["emitters_enabled"]
                and (sc["emitter_sampling"] == EmitterSampling.NONE or bounce == 0)
                and sc["emittance"][mat] > EPSILON
            ):
                radiance += throughput * albedo[:3] * albedo[:3] * sc["emittance"][mat]
            if strat.sun_sampling:
                sdir = _sun_cone_dir(sc, u[U_SUN1], u[U_SUN2])
                front = np.dot(sdir, n) > 0.0
                sss = (
                    (sc["flags"][mat] & FLAG_SUBSURFACE_SCATTER) != 0
                    and u[U_SUBSURFACE] < sc["f_sub_surface"]
                )
                if front or sss:
                    so = hitpoint if front else hitpoint - OFFSET * n
                    att = _shadow_attenuation(sc, so, sdir, cur_mat)
                    lum = (
                        1.0 / sc["sun_luminosity"] if strat.sun_luminosity else 1.0
                    )
                    if att[3] > 0.0:
                        mult = abs(np.dot(sdir, n)) * lum * att[3]
                        direct = att[:3] * mult
                        radiance += (
                            throughput * albedo[:3] * direct * sc["sun_emittance"][:3]
                        )
            if (
                sc["emitter_sampling"] != EmitterSampling.NONE
                and sc.get("emitters") is not None
                and sc["emitters_enabled"]
            ):
                radiance += throughput * _emitter_nee_strategy(
                    sc, hitpoint, n, albedo, u, cur_mat
                )
            d_new, w = _diffuse_dir(sc, n, u, strat.importance_sampling)
            throughput = throughput * albedo[:3] * w
            origin = hitpoint + d_new * OFFSET
            d = d_new
            specular_flag = False
        elif do_refr:
            refractive = (sc["flags"][mat] & FLAG_REFRACTIVE) != 0
            ratio = ior1 / ior2
            cos_theta = -np.dot(d, n)
            radicand = 1.0 - ratio * ratio * (1.0 - cos_theta * cos_theta)
            a, b = ratio - 1.0, ratio + 1.0
            r0 = a * a / (b * b)
            refl_p = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
            tir = refractive and radicand < EPSILON
            if tir or u[U_FRESNEL] < refl_p:
                d_new = _specular_dir(d, n, sc["roughness"][mat], u)
            elif refractive:
                t2 = np.sqrt(max(radicand, 0.0))
                if cos_theta > 0.0:
                    d_new = ratio * d + (ratio * cos_theta - t2) * n
                else:
                    d_new = ratio * d - (-ratio * cos_theta - t2) * n
                d_new = d_new / np.linalg.norm(d_new)
                d_new = _opposite_side(d_new, n, d)
                throughput = throughput * albedo[:3] * alpha
                cur_mat = mat
            else:
                d_new = d
                throughput = throughput * albedo[:3] * alpha
                cur_mat = mat
            origin = hitpoint + d_new * OFFSET
            d = d_new
        else:  # transmission
            throughput = throughput * albedo[:3] * alpha
            cur_mat = mat
            origin = hitpoint + d * OFFSET

    return radiance

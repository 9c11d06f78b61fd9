"""Scalar NumPy oracle for the Laine–Karras ESVO stack traversal.

This is the slow, trusted reference implementation of the traversal semantics
specified by ``/root/reference/src/octree/octree_traversal.rs:54-302`` (CPU)
and ``assets/shaders/svo.wgsl:226-485`` (GPU): coordinates remapped to [1,2),
epsilon-clamped direction components (sign-preserving bit ops), mirror-mask
canonicalization to negative directions, a 24-entry (octant, t_max) stack
indexed by scale, PUSH / ADVANCE / POP with float-bit scale pops.

The TPU kernels in ``ops/traversal.py`` are validated lane-for-lane against
this oracle on randomized octrees and rays.

Known deviations from the reference (intentional):

- face_id for x-axis faces is ``0 | sign`` (West=0 / East=1).  The reference
  computes ``1 << 0 | sign`` (``octree_traversal.rs:164``) which collapses
  both x faces to 1; y/z cases follow the evident ``axis*2 | sign`` pattern
  (Bottom=2/Top=3/South=4/North=5 per ``src/geometry/cuboid.rs:10-17``), so we
  use the pattern for x as well.
- a leaf is only reported when ``t_min > 0`` (the reference's preview variant,
  ``octree_traversal.rs:394``; the path-tracer variant admits ``t_min == 0``
  but then skips the model intersection at ``:194``, falling through to
  ADVANCE — same observable behavior for cube leaves).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAX_STEPS = 1000  # octree_traversal.rs:13
MAX_SCALE = 23  # octree_traversal.rs:14
EPSILON = np.float32(1.1920929e-7)  # octree_traversal.rs:15


def _bits(x: np.float32) -> np.uint32:
    return np.frombuffer(np.float32(x).tobytes(), dtype=np.uint32)[0]


def _from_bits(b: np.uint32) -> np.float32:
    return np.frombuffer(np.uint32(b).tobytes(), dtype=np.float32)[0]


@dataclasses.dataclass
class OracleHit:
    hit: bool
    t: float = np.inf  # in octree-cube units ([1,2) space); world t = t / octree_scale
    face_id: int = -1
    u: float = 0.0
    v: float = 0.0
    leaf_value: int = 0
    steps: int = 0
    # voxel corner of the hit leaf in [1,2) space (unmirrored) and its size
    voxel_pos: tuple = (0.0, 0.0, 0.0)
    voxel_size: float = 0.0


def traverse_oracle(
    child_mask: np.ndarray,
    child_data: np.ndarray,
    root: int,
    octree_scale: float,
    origin: np.ndarray,
    direction: np.ndarray,
    max_dst: float = 1024.0,
    reject_leaves: set | None = None,
    accept_fn=None,
) -> OracleHit:
    """Trace one ray through the node pool; returns the first accepted leaf.

    ``reject_leaves``: optional set of leaf values to skip (models the
    path-tracer falling through to ADVANCE when the leaf model's alpha test
    fails, ``octree_traversal.rs:192-215``).
    ``accept_fn(leaf_value, face_id, u, v, t_world) -> bool``: optional
    per-candidate predicate (e.g. texture alpha / null-material test); a
    rejected candidate falls through to ADVANCE like ``reject_leaves``.
    """
    f32 = np.float32
    ro = (np.asarray(origin, f32) * f32(octree_scale) + f32(1.0)).astype(f32)
    rd = np.asarray(direction, f32).copy()
    max_dst = f32(max_dst * octree_scale)

    sign_mask = np.uint32(0x80000000)
    eps_bits = _bits(EPSILON) & ~sign_mask
    for i in range(3):
        if abs(rd[i]) < EPSILON:
            rd[i] = _from_bits(np.uint32(eps_bits | (_bits(rd[i]) & sign_mask)))

    t_coef = (f32(1.0) / -np.abs(rd)).astype(f32)
    t_bias = (t_coef * ro).astype(f32)
    mirror_mask = 0
    for i in range(3):
        if rd[i] > 0:
            mirror_mask |= 1 << i
            t_bias[i] = f32(3.0) * t_coef[i] - t_bias[i]

    t_min = max(f32((f32(2.0) * t_coef - t_bias).max()), f32(0.0))
    t_max = f32((t_coef - t_bias).min())
    h = t_max
    index = 0
    pos = np.array([1.0, 1.0, 1.0], f32)
    upper = (f32(1.5) * t_coef - t_bias).astype(f32)
    for i in range(3):
        if upper[i] > t_min:
            index ^= 1 << i
            pos[i] = f32(1.5)

    parent = int(root)
    scale = MAX_SCALE - 1
    scale_exp2 = f32(0.5)
    stack_idx = np.zeros(MAX_SCALE + 1, np.uint32)
    stack_t = np.zeros(MAX_SCALE + 1, f32)

    for step in range(MAX_STEPS):
        if max_dst >= 0.0 and t_min > max_dst:
            return OracleHit(False, steps=step)

        t_corner = (pos * t_coef - t_bias).astype(f32)
        tc_max = f32(t_corner.min())

        slot = index ^ mirror_mask
        mask = int(child_mask[parent])
        present = (mask >> slot) & 1
        leaf = (mask >> (slot + 8)) & 1
        value = int(child_data[parent, slot])

        descend = False
        if present and t_min <= t_max:
            if leaf and t_min > 0.0:
                accepted = reject_leaves is None or value not in reject_leaves
                if accepted:
                    # Hit info: entry times of the leaf voxel per axis
                    # (octree_traversal.rs:149-190).
                    unmirrored_pos = pos.copy()  # noqa: F841 (set below)
                    for i in range(3):
                        if mirror_mask & (1 << i):
                            unmirrored_pos[i] = f32(3.0) - scale_exp2 - unmirrored_pos[i]
                    t_corner_h = ((pos + scale_exp2) * t_coef - t_bias).astype(f32)
                    tc_min = f32(t_corner_h.max())
                    if t_corner_h[0] == tc_min:
                        axis = 0
                    elif t_corner_h[1] == tc_min:
                        axis = 1
                    else:
                        axis = 2
                    sign = int(_bits(rd[axis]) >> np.uint32(31))
                    face_id = (axis << 1) | sign
                    a1, a2 = [(2, 1), (0, 2), (0, 1)][axis]
                    uu = f32(
                        (ro[a1] + rd[a1] * t_corner_h[axis]) - unmirrored_pos[a1]
                    ) / scale_exp2
                    vv = f32(
                        (ro[a2] + rd[a2] * t_corner_h[axis]) - unmirrored_pos[a2]
                    ) / scale_exp2
                    if rd[axis] < 0.0 and axis in (0, 2):
                        uu = f32(1.0) - uu
                    if rd[axis] < 0.0 and axis == 1:
                        vv = f32(1.0) - vv
                    if accept_fn is None or accept_fn(
                        value, face_id, float(uu), float(vv), float(t_min) / octree_scale
                    ):
                        return OracleHit(
                            True,
                            t=float(t_min),
                            face_id=face_id,
                            u=float(uu),
                            v=float(vv),
                            leaf_value=value,
                            steps=step,
                            voxel_pos=tuple(float(x) for x in unmirrored_pos),
                            voxel_size=float(scale_exp2),
                        )
                # rejected: fall through to ADVANCE
            elif not leaf:
                half = f32(scale_exp2 * f32(0.5))
                t_center = (half * t_coef + t_corner).astype(f32)
                tv_max = f32(min(t_max, tc_max))
                if t_min <= tv_max:
                    # PUSH (octree_traversal.rs:216-243)
                    if tc_max < h:
                        stack_idx[scale] = parent
                        stack_t[scale] = t_max
                    h = tc_max
                    parent = value
                    scale -= 1
                    scale_exp2 = half
                    index = 0
                    for i in range(3):
                        if t_center[i] > t_min:
                            index ^= 1 << i
                            pos[i] = f32(pos[i] + scale_exp2)
                    t_max = tv_max
                    descend = True

        if descend:
            continue

        # ADVANCE (octree_traversal.rs:249-260)
        step_mask = 0
        for i in range(3):
            if t_corner[i] <= tc_max:
                step_mask ^= 1 << i
                pos[i] = f32(pos[i] - scale_exp2)
        t_min = tc_max
        index ^= step_mask

        if (index & step_mask) != 0:
            # POP (octree_traversal.rs:262-299)
            differing = np.uint32(0)
            for i in range(3):
                if step_mask & (1 << i):
                    differing |= _bits(pos[i]) ^ _bits(f32(pos[i] + scale_exp2))
            if differing == 0:
                return OracleHit(False, steps=step)
            # find_msb_u32 = 31 - clz (util.rs:121-133)
            scale = int(differing).bit_length() - 1
            scale_exp2 = f32(np.exp2(scale - MAX_SCALE))
            if scale >= MAX_SCALE:
                return OracleHit(False, steps=step)
            parent = int(stack_idx[scale])
            t_max = stack_t[scale]
            sh = [0, 0, 0]
            for i in range(3):
                sh[i] = int(_bits(pos[i])) >> scale
                pos[i] = _from_bits(np.uint32((sh[i] << scale) & 0xFFFFFFFF))
            index = (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2)
            h = f32(0.0)

    return OracleHit(False, steps=MAX_STEPS)

"""Ray–scene intersection: branch-free primitives + lockstep MTBVH traversal.

TPU re-design of the reference's per-thread device routines:

* slab test          — ``AABB::intersect``            (bvh.h:91-155)
* Möller–Trumbore    — ``intersectTriangle``          (intersections.h:20-68)
* MTBVH traversal    — ``DevScene::intersect``        (scene.h:262-301)
* occlusion          — ``DevScene::testOcclusion``    (scene.h:303-334)
* brute-force oracle — ``DevScene::naiveIntersect``   (scene.h:218-242)
* BVH heatmap        — ``DevScene::visualizedIntersect`` (scene.h:336-372)

Instead of one divergent while-loop per CUDA thread, a whole wavefront of N
rays advances in lockstep through a ``lax.while_loop``: each iteration every
active lane visits exactly one node (gathered from dense int32/float32 arrays
in HBM), exactly mirroring the reference's per-iteration work.  Lanes that
finish park at ``node == BVHSize`` and no-op.  All tests are branch-free
(masks, no data-dependent Python control flow) so XLA vectorizes them onto
the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NULL_PRIMITIVE = -1
RAY_OFFSET = 1e-5  # reference makeOffsetedRay (intersections.h:16-18)
FLT_MAX = jnp.float32(3.402823466e38)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def slab_test(bmin, bmax, ori, dir):
    """Branch-free ray/AABB slab test.

    Returns (hit [N] bool, t_near [N]).  t_near may be negative when the
    origin is inside the box — same contract as the reference's
    ``AABB::intersect`` out-param (bvh.h:91-155), whose manually unrolled
    special cases exist only to dodge divergence penalties that the VPU does
    not have; a sanitized slab test is both simpler and faster here.
    """
    inv = 1.0 / dir  # +-inf where dir == 0 (fine)
    t1 = (bmin - ori) * inv
    t2 = (bmax - ori) * inv
    # 0 * inf -> nan when origin sits exactly on a slab of a flat box;
    # treat that axis as non-constraining.
    t_lo = jnp.nan_to_num(jnp.minimum(t1, t2), nan=-jnp.inf)
    t_hi = jnp.nan_to_num(jnp.maximum(t1, t2), nan=jnp.inf)
    t_near = jnp.max(t_lo, axis=-1)
    t_far = jnp.min(t_hi, axis=-1)
    hit = (t_far >= 0.0) & (t_far >= t_near)
    return hit, t_near


def moller_trumbore(v0, v1, v2, ori, dir):
    """Branch-free Möller–Trumbore with sign-normalized determinant
    (intersections.h:20-68).

    Returns (hit [N] bool, dist [N], bary [N, 2]).
    """
    e01 = v1 - v0
    e02 = v2 - v0
    pvec = jnp.cross(dir, e02)
    det0 = jnp.sum(e01 * pvec, axis=-1)
    sign = jnp.where(det0 < 0.0, -1.0, 1.0)
    det = jnp.abs(det0)
    s = (ori - v0) * sign[..., None]
    bx = jnp.sum(s * pvec, axis=-1)
    qvec = jnp.cross(s, e01)
    by = jnp.sum(dir * qvec, axis=-1)
    inv_det = 1.0 / jnp.maximum(det, 1e-30)
    dist = jnp.sum(e02 * qvec, axis=-1) * inv_det
    hit = (
        (det >= 1.1920929e-07)  # FLT_EPSILON, like the reference
        & (bx >= 0.0)
        & (bx <= det)
        & (by >= 0.0)
        & (bx + by <= det)
        & (dist > 0.0)
    )
    bary = jnp.stack([bx, by], axis=-1) * inv_det[..., None]
    return hit, dist, bary


def get_dir_class(d):
    """Map a direction to one of 6 axis-sign classes — ``DevScene::getMTBVHId``
    (scene.h:114-129).  NOTE: like the reference, traversal passes the
    *negated* ray direction."""
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    x_cls = jnp.where(d[..., 0] > 0, 0, 1)
    y_cls = jnp.where(d[..., 1] > 0, 2, 3)
    z_cls = jnp.where(d[..., 2] > 0, 4, 5)
    return jnp.where(
        ax > ay,
        jnp.where(ax > az, x_cls, z_cls),
        jnp.where(ay > az, y_cls, z_cls),
    ).astype(jnp.int32)


def make_offseted(ori, dir):
    return ori + dir * RAY_OFFSET


# ---------------------------------------------------------------------------
# brute force (oracle + small scenes)
# ---------------------------------------------------------------------------


def intersect_brute(tri_v, ray_o, ray_d, chunk: int = 2048):
    """All-pairs closest hit; [N] rays x [T] triangles in [N, chunk] tiles.

    Oracle for the BVH path (mirrors ``naiveIntersect``, scene.h:218-242) and
    the fast path for tiny scenes where a tree walk isn't worth it.
    Returns (prim_id [N] int32, dist [N], bary [N, 2]).
    """
    num_tris = tri_v.shape[0]
    # don't pad tiny scenes up to a full chunk (Cornell = 36 tris would waste
    # 57x work at chunk 2048); round to the 8-sublane granule instead
    chunk = min(chunk, max(8, -(-num_tris // 8) * 8))
    num_chunks = max(1, -(-num_tris // chunk))
    pad = num_chunks * chunk - num_tris
    tv = jnp.pad(tri_v, ((0, pad), (0, 0), (0, 0)))

    n = ray_o.shape[0]
    init = (
        jnp.full((n,), NULL_PRIMITIVE, jnp.int32),
        jnp.full((n,), FLT_MAX),
        jnp.zeros((n, 2), jnp.float32),
    )

    def body(c, carry):
        best_prim, best_dist, best_bary = carry
        tvc = jax.lax.dynamic_slice(tv, (c * chunk, 0, 0), (chunk, 3, 3))
        # [N, chunk] broadcast: rays x tris
        o = ray_o[:, None, :]
        d = ray_d[:, None, :]
        hit, dist, bary = moller_trumbore(
            tvc[None, :, 0], tvc[None, :, 1], tvc[None, :, 2], o, d
        )
        tri_idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
        hit = hit & (tri_idx[None, :] < num_tris)
        dist = jnp.where(hit, dist, FLT_MAX)
        j = jnp.argmin(dist, axis=-1)
        cd = jnp.take_along_axis(dist, j[:, None], axis=1)[:, 0]
        cb = jnp.take_along_axis(bary, j[:, None, None], axis=1)[:, 0]
        upd = cd < best_dist
        best_prim = jnp.where(upd, tri_idx[j], best_prim)
        best_dist = jnp.where(upd, cd, best_dist)
        best_bary = jnp.where(upd[:, None], cb, best_bary)
        return best_prim, best_dist, best_bary

    if num_chunks == 1:
        return body(0, init)
    return jax.lax.fori_loop(0, num_chunks, body, init)


def occlusion_brute(tri_v, x, y, chunk: int = 2048):
    """Any-hit between points x and y — ``naiveTestOcclusion`` (scene.h:244-260).
    Returns bool [N] (True = occluded)."""
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    max_dist = dist - eps
    ori = make_offseted(x, dirn)
    prim, hit_dist, _ = intersect_brute(tri_v, ori, dirn, chunk)
    return (prim != NULL_PRIMITIVE) & (hit_dist < max_dist)


# ---------------------------------------------------------------------------
# MTBVH lockstep traversal
# ---------------------------------------------------------------------------


def _node_fetch(bvh_prim, bvh_aabb, bvh_miss, bounds_min, bounds_max, dir_off, node, size):
    idx = dir_off + jnp.minimum(node, size - 1)
    prim = bvh_prim[idx]
    aabb = bvh_aabb[idx]
    miss = bvh_miss[idx]
    bmin = bounds_min[aabb]
    bmax = bounds_max[aabb]
    return prim, miss, bmin, bmax


def intersect_bvh(
    tri_v, bounds_min, bounds_max, bvh_prim, bvh_aabb, bvh_miss, ray_o, ray_d
):
    """Closest-hit via stackless threaded traversal (scene.h:262-301).

    ``bvh_prim/aabb/miss`` are the flattened [6*B] int32 arrays; every lane
    walks its own direction-class segment.  Returns (prim_id, dist, bary).
    """
    size = bounds_min.shape[0]
    n = ray_o.shape[0]
    dir_off = get_dir_class(-ray_d) * size

    def cond(state):
        node, _, _, _ = state
        return jnp.any(node < size)

    def body(state):
        node, c_prim, c_dist, c_bary = state
        active = node < size
        prim, miss, bmin, bmax = _node_fetch(
            bvh_prim, bvh_aabb, bvh_miss, bounds_min, bounds_max, dir_off, node, size
        )
        bhit, bdist = slab_test(bmin, bmax, ray_o, ray_d)
        descend = active & bhit & (bdist < c_dist)

        is_leaf = descend & (prim != NULL_PRIMITIVE)
        pv = tri_v[jnp.maximum(prim, 0)]
        thit, tdist, tbary = moller_trumbore(pv[:, 0], pv[:, 1], pv[:, 2], ray_o, ray_d)
        upd = is_leaf & thit & (tdist < c_dist)
        c_prim = jnp.where(upd, prim, c_prim)
        c_dist = jnp.where(upd, tdist, c_dist)
        c_bary = jnp.where(upd[:, None], tbary, c_bary)

        node = jnp.where(active, jnp.where(descend, node + 1, miss), node)
        return node, c_prim, c_dist, c_bary

    init = (
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), NULL_PRIMITIVE, jnp.int32),
        jnp.full((n,), FLT_MAX),
        jnp.zeros((n, 2), jnp.float32),
    )
    _, prim, dist, bary = jax.lax.while_loop(cond, body, init)
    return prim, dist, bary


def occlusion_bvh(
    tri_v, bounds_min, bounds_max, bvh_prim, bvh_aabb, bvh_miss, x, y
):
    """Any-hit shadow query with early lane termination (scene.h:303-334).
    Returns bool [N] (True = occluded)."""
    size = bounds_min.shape[0]
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    ray_d = d / dist[..., None]
    max_dist = dist - eps
    ray_o = make_offseted(x, ray_d)
    dir_off = get_dir_class(-ray_d) * size
    n = x.shape[0]

    def cond(state):
        node, _ = state
        return jnp.any(node < size)

    def body(state):
        node, blocked = state
        active = node < size
        prim, miss, bmin, bmax = _node_fetch(
            bvh_prim, bvh_aabb, bvh_miss, bounds_min, bounds_max, dir_off, node, size
        )
        bhit, bdist = slab_test(bmin, bmax, ray_o, ray_d)
        descend = active & bhit & (bdist < max_dist)

        is_leaf = descend & (prim != NULL_PRIMITIVE)
        pv = tri_v[jnp.maximum(prim, 0)]
        thit, tdist, _ = moller_trumbore(pv[:, 0], pv[:, 1], pv[:, 2], ray_o, ray_d)
        found = is_leaf & thit & (tdist < max_dist)
        blocked = blocked | found

        node = jnp.where(active, jnp.where(descend, node + 1, miss), node)
        node = jnp.where(blocked, size, node)  # early exit for settled lanes
        return node, blocked

    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    _, blocked = jax.lax.while_loop(cond, body, init)
    return blocked


def intersect_bvh_heatmap(
    tri_v, bounds_min, bounds_max, bvh_prim, bvh_aabb, bvh_miss, ray_o, ray_d
):
    """Traversal-depth heatmap for BVH debugging (``visualizedIntersect``,
    scene.h:336-372).  Returns int32 [N] = number of descended nodes."""
    size = bounds_min.shape[0]
    n = ray_o.shape[0]
    dir_off = get_dir_class(-ray_d) * size

    def cond(state):
        node, _, _ = state
        return jnp.any(node < size)

    def body(state):
        node, c_dist, steps = state
        active = node < size
        prim, miss, bmin, bmax = _node_fetch(
            bvh_prim, bvh_aabb, bvh_miss, bounds_min, bounds_max, dir_off, node, size
        )
        bhit, bdist = slab_test(bmin, bmax, ray_o, ray_d)
        descend = active & bhit & (bdist < c_dist)
        is_leaf = descend & (prim != NULL_PRIMITIVE)
        pv = tri_v[jnp.maximum(prim, 0)]
        thit, tdist, _ = moller_trumbore(pv[:, 0], pv[:, 1], pv[:, 2], ray_o, ray_d)
        upd = is_leaf & thit & (tdist < c_dist)
        c_dist = jnp.where(upd, tdist, c_dist)
        steps = steps + descend.astype(jnp.int32)
        node = jnp.where(active, jnp.where(descend, node + 1, miss), node)
        return node, c_dist, steps

    init = (jnp.zeros((n,), jnp.int32), jnp.full((n,), FLT_MAX), jnp.zeros((n,), jnp.int32))
    _, _, steps = jax.lax.while_loop(cond, body, init)
    return steps

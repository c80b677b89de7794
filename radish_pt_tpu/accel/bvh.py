"""SAH BVH builder + MTBVH (6-way threaded, stackless) flattening.

Host-side re-implementation of the reference builder
(``/root/reference/src/bvh.cpp:12-183``) in numpy.  Layout contract (shared
with the traversal kernels in :mod:`radish_pt_tpu.accel.traverse`):

* Flattened depth-first array of ``2*numPrims - 1`` nodes; an interior node's
  whole subtree occupies the contiguous slots right after it; every leaf holds
  exactly one primitive.
* ``bounds_min/max[B, 3]`` are indexed by *original* (SAH-order) node id.
* For each of 6 axis-sign ray-direction classes the node sequence is
  re-ordered near-to-far and threaded: ``miss[i]`` says where to jump when the
  node's AABB test fails; walking ``i+1`` on hit and ``miss[i]`` on miss
  visits the tree front-to-back with no stack (Hachisuka, TDF 2015 — the same
  scheme the reference cites at bvh.cpp:3-9).

The "multi-threaded" part maps beautifully to TPU: the 6 direction classes
become a leading axis of dense int32 arrays in HBM, and traversal is a
lockstep ``while_loop`` over ray lanes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NULL_PRIMITIVE = -1
NUM_BUCKETS = 16


@dataclass
class BVH:
    """Host-side BVH; all arrays numpy."""

    bounds_min: np.ndarray  # float32 [B, 3], indexed by original node id
    bounds_max: np.ndarray  # float32 [B, 3]
    prim_id: np.ndarray  # int32 [6, B]  (NULL_PRIMITIVE for interior)
    aabb_id: np.ndarray  # int32 [6, B]  original node id for bounds lookup
    miss: np.ndarray  # int32 [6, B]  next node on AABB miss (B = "done")
    depth: int

    @property
    def size(self) -> int:
        return int(self.bounds_min.shape[0])


def build_bvh(vertices: np.ndarray) -> BVH:
    """Build the SAH BVH + 6-way threaded orders.

    ``vertices``: float32 [3T, 3] flat triangle soup (corner-major, like the
    reference's global mesh arrays).
    """
    v = np.asarray(vertices, dtype=np.float32).reshape(-1, 3, 3)
    num_prims = v.shape[0]
    assert num_prims > 0
    size = 2 * num_prims - 1

    prim_min = v.min(axis=1)
    prim_max = v.max(axis=1)
    prim_center = (prim_min + prim_max) * 0.5

    # mutable primitive order
    order = np.arange(num_prims, dtype=np.int32)

    bounds_min = np.empty((size, 3), np.float32)
    bounds_max = np.empty((size, 3), np.float32)
    is_leaf = np.zeros(size, dtype=bool)
    prim_or_size = np.empty(size, np.int32)  # leaf: primId, interior: subtree size

    stack: list[tuple[int, int, int]] = [(0, 0, num_prims - 1)]
    depth = 0
    while stack:
        depth = max(depth, len(stack))
        offset, start, end = stack.pop()
        n_sub = end - start + 1
        node_size = 2 * n_sub - 1

        ids = order[start : end + 1]
        bounds_min[offset] = prim_min[ids].min(axis=0)
        bounds_max[offset] = prim_max[ids].max(axis=0)

        if n_sub == 1:
            is_leaf[offset] = True
            prim_or_size[offset] = ids[0]
            continue
        is_leaf[offset] = False
        prim_or_size[offset] = node_size

        centers = prim_center[ids]
        c_min = centers.min(axis=0)
        c_max = centers.max(axis=0)
        axis = int(np.argmax(c_max - c_min))

        if n_sub == 2:
            a, b = order[start], order[end]
            if prim_center[a, axis] > prim_center[b, axis]:
                order[start], order[end] = b, a
            stack.append((offset + 2, end, end))
            stack.append((offset + 1, start, start))
            continue

        extent = c_max[axis] - c_min[axis]
        if extent <= 0.0:
            # all centers identical: median split
            mid = start + n_sub // 2 - 1
        else:
            t = (centers[:, axis] - c_min[axis]) / extent
            bucket = np.clip((t * NUM_BUCKETS).astype(np.int32), 0, NUM_BUCKETS - 1)

            # per-bucket bounds + counts (vectorized)
            counts = np.bincount(bucket, minlength=NUM_BUCKETS)
            b_min = np.full((NUM_BUCKETS, 3), np.inf, np.float32)
            b_max = np.full((NUM_BUCKETS, 3), -np.inf, np.float32)
            np.minimum.at(b_min, bucket, prim_min[ids])
            np.maximum.at(b_max, bucket, prim_max[ids])

            # prefix/suffix unions
            l_min = np.minimum.accumulate(b_min, axis=0)
            l_max = np.maximum.accumulate(b_max, axis=0)
            r_min = np.minimum.accumulate(b_min[::-1], axis=0)[::-1]
            r_max = np.maximum.accumulate(b_max[::-1], axis=0)[::-1]
            count_prefix = np.cumsum(counts)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])

            # SAH cost of splitting after bucket i — lerp form like the
            # reference (bvh.cpp:103-111): mix(leftArea, rightArea, leftFrac)
            la = area(l_min, l_max)[: NUM_BUCKETS - 1]
            ra = area(r_min, r_max)[1:]
            frac = count_prefix[: NUM_BUCKETS - 1] / n_sub
            sah = la * (1.0 - frac) + ra * frac
            # guard against empty-side splits
            valid = (count_prefix[: NUM_BUCKETS - 1] > 0) & (
                count_prefix[: NUM_BUCKETS - 1] < n_sub
            )
            sah = np.where(valid, sah, np.inf)
            div_bucket = int(np.argmin(sah))

            left_mask = bucket <= div_bucket
            n_left = int(left_mask.sum())
            if n_left == 0 or n_left == n_sub:
                mid = start + n_sub // 2 - 1
            else:
                # stable partition keeps SAH-bucket order deterministic
                order[start : end + 1] = np.concatenate(
                    [ids[left_mask], ids[~left_mask]]
                )
                mid = start + n_left - 1

        l_size = 2 * (mid - start + 1) - 1
        stack.append((offset + 1 + l_size, mid + 1, end))
        stack.append((offset + 1, start, mid))

    prim_id6, aabb_id6, miss6 = _thread_mtbvh(
        bounds_min, bounds_max, is_leaf, prim_or_size
    )
    return BVH(
        bounds_min=bounds_min,
        bounds_max=bounds_max,
        prim_id=prim_id6,
        aabb_id=aabb_id6,
        miss=miss6,
        depth=depth,
    )


def _thread_mtbvh(bounds_min, bounds_max, is_leaf, prim_or_size):
    """Produce the 6 near-to-far threaded orders (reference bvh.cpp:136-183).

    Direction class i: axis = i // 2, positive ray dir if i % 2 == 0.  The
    child whose center is *smaller* along the axis comes first for positive
    directions (we traverse with the ray's own direction class; see
    traverse.get_dir_class for the sign convention).
    """
    size = bounds_min.shape[0]
    center = (bounds_min + bounds_max) * 0.5
    prim_id6 = np.empty((6, size), np.int32)
    aabb_id6 = np.empty((6, size), np.int32)
    miss6 = np.empty((6, size), np.int32)

    for d in range(6):
        axis = d // 2
        flip = bool(d & 1)
        new_id = 0
        stack = [0]
        while stack:
            orig = stack.pop()
            leaf = is_leaf[orig]
            node_size = 1 if leaf else int(prim_or_size[orig])
            prim_id6[d, new_id] = prim_or_size[orig] if leaf else NULL_PRIMITIVE
            aabb_id6[d, new_id] = orig
            miss6[d, new_id] = new_id + node_size
            new_id += 1
            if leaf:
                continue
            left = orig + 1
            left_size = 1 if is_leaf[left] else int(prim_or_size[left])
            right = left + left_size
            # Reference convention (bvh.cpp:171-177): classes are selected at
            # traversal time with the NEGATED ray direction (scene.h:267), so
            # even classes serve negative-axis rays and visit the larger-
            # center child first.
            near, far = left, right
            if (center[left, axis] < center[right, axis]) != flip:
                near, far = right, left
            stack.append(far)
            stack.append(near)
    return prim_id6, aabb_id6, miss6

"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.accel import traverse as trv
from radish_pt_tpu.accel.pallas_kernels import (
    intersect_brute_pallas,
    intersect_plucker_pallas,
    intersect_quad_pallas,
    occlusion_brute_pallas,
    occlusion_plucker_pallas,
    occlusion_quad_pallas,
)


@pytest.fixture(scope="module")
def scene_rays():
    rng = np.random.default_rng(21)
    centers = rng.uniform(-3, 3, size=(40, 1, 3))
    soup = (centers + rng.normal(scale=0.5, size=(40, 3, 3))).astype(np.float32)
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    n = 64
    ray_o = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    targets = soup.mean(axis=1)[rng.integers(0, 40, n)]
    ray_d = targets - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    return tri_packed, jnp.asarray(ray_o), jnp.asarray(ray_d.astype(np.float32))


def test_pallas_brute_matches_xla(scene_rays):
    tri_packed, ray_o, ray_d = scene_rays
    p0, d0, b0 = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1, b1 = intersect_brute_pallas(tri_packed, ray_o, ray_d, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    assert hits.mean() > 0.3
    np.testing.assert_allclose(np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b1)[hits], np.asarray(b0)[hits], atol=2e-4)


def test_plucker_matches_xla(scene_rays):
    """The MXU Plücker formulation is algebraically identical to MT; require
    exact prim parity (random rays — no edge hits).  Distances are SELECTOR
    grade: the bf16x3 planes carry ~2^-17 noise relative to the largest dot
    term, which cancellation amplifies to ~1e-3 on t — renderers recompute
    exact t from the winner id (surface_info_from_t), never consume this."""
    tri_packed, ray_o, ray_d = scene_rays
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_pallas(tri_packed, ray_o, ray_d, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )


def test_plucker_culled_matches_uncached(scene_rays):
    """Spatial permutation + cluster-mask culling must not change results
    (conservative culling; ids mapped back through the 5th matmul group)."""
    tri_packed, ray_o, ray_d = scene_rays
    t = tri_packed.shape[0]
    rng = np.random.default_rng(11)
    order = jnp.asarray(rng.permutation(t).astype(np.int32))
    tp = np.asarray(tri_packed)[np.asarray(order)]
    v = np.stack(
        [tp[:, 0:3], tp[:, 0:3] + tp[:, 3:6], tp[:, 0:3] + tp[:, 6:9]], axis=1
    )
    n_clusters = -(-t // 64)
    cb = np.empty((n_clusters, 6), np.float32)
    for ci in range(n_clusters):
        g = v[ci * 64:(ci + 1) * 64].reshape(-1, 3)
        cb[ci, 0:3] = g.min(axis=0)
        cb[ci, 3:6] = g.max(axis=0)
    p0, d0 = intersect_plucker_pallas(tri_packed, ray_o, ray_d, interpret=True)
    p1, d1 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d,
        tri_order=order, cluster_bounds=jnp.asarray(cb), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )


def test_plucker_surface_recovery(scene_rays):
    """surface_info_from_t's projected barycentrics match the explicit
    barycentrics from the VPU sweep."""
    from radish_pt_tpu.scene import device_scene as dsc

    tri_packed, ray_o, ray_d = scene_rays
    p0, d0, b0 = trv.intersect_brute(tri_packed, ray_o, ray_d)
    # build a minimal DeviceScene carrying only tri_attr
    v = np.asarray(tri_packed[:, 0:3])
    e1 = np.asarray(tri_packed[:, 3:6])
    e2 = np.asarray(tri_packed[:, 6:9])
    tri_v = np.stack([v, v + e1, v + e2], axis=1)
    rng = np.random.default_rng(5)
    tri_n = rng.normal(size=tri_v.shape).astype(np.float32)
    tri_n /= np.linalg.norm(tri_n, axis=-1, keepdims=True)
    tri_uv = rng.uniform(size=(tri_v.shape[0], 3, 2)).astype(np.float32)
    mat_ids = rng.integers(0, 7, tri_v.shape[0]).astype(np.float32)
    attr = np.concatenate(
        [tri_v.reshape(-1, 9), tri_n.reshape(-1, 9), tri_uv.reshape(-1, 6),
         mat_ids[:, None]],
        axis=1,
    )
    ds = dsc.DeviceScene(tri_attr=jnp.asarray(attr))
    pos_t, norm_t, uv_t, mid_t = dsc.surface_info_from_t(ds, p0, ray_o, ray_d)
    pos_b, norm_b, uv_b, mid_b = dsc.surface_info(ds, p0, b0)
    np.testing.assert_array_equal(np.asarray(mid_t), np.asarray(mid_b))
    np.testing.assert_array_equal(
        np.asarray(mid_t)[np.asarray(p0) >= 0],
        mat_ids.astype(np.int32)[np.asarray(p0)[np.asarray(p0) >= 0]],
    )
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(pos_t)[hits], np.asarray(pos_b)[hits], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(norm_t)[hits], np.asarray(norm_b)[hits], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(uv_t)[hits], np.asarray(uv_b)[hits], atol=1e-3
    )


def test_quad_matches_xla(scene_rays):
    """The quadratic-feature kernel must agree with brute MT on prim ids
    (random rays, no edge-grazing near-ties).  Its ``t`` is SELECTOR-grade:
    the quadratic form squares MT's condition number, so grazing hits carry
    up to ~1% distance error (surface_info_from_t recomputes exact t from
    the winner id; renderers never consume this raw value)."""
    tri_packed, ray_o, ray_d = scene_rays
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_quad_pallas(tri_packed, ray_o, ray_d, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=3e-2
    )


def test_quad_culled_matches(scene_rays):
    """Cluster-mask culling + explicit tri_order permutation must be
    invisible in results (conservative culling, positional ids mapped back)."""
    tri_packed, ray_o, ray_d = scene_rays
    t = tri_packed.shape[0]
    rng = np.random.default_rng(11)
    order = jnp.asarray(rng.permutation(t).astype(np.int32))
    tp = np.asarray(tri_packed)[np.asarray(order)]
    v = np.stack(
        [tp[:, 0:3], tp[:, 0:3] + tp[:, 3:6], tp[:, 0:3] + tp[:, 6:9]], axis=1
    )
    n_clusters = -(-t // 64)
    cb = np.empty((n_clusters, 6), np.float32)
    for ci in range(n_clusters):
        g = v[ci * 64:(ci + 1) * 64].reshape(-1, 3)
        cb[ci, 0:3] = g.min(axis=0)
        cb[ci, 3:6] = g.max(axis=0)
    p0, d0 = intersect_quad_pallas(tri_packed, ray_o, ray_d, interpret=True)
    p1, d1 = intersect_quad_pallas(
        jnp.asarray(tp), ray_o, ray_d,
        tri_order=order, cluster_bounds=jnp.asarray(cb), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    # different triangle order -> different f32 summation order; selector-
    # grade t may wiggle within its conditioning bound
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=3e-2
    )


def test_quad_occlusion_matches_xla(scene_rays):
    tri_packed, ray_o, ray_d = scene_rays
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_quad_pallas(tri_packed, x, y, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_plucker_occlusion_matches_xla(scene_rays):
    tri_packed, ray_o, ray_d = scene_rays
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_plucker_pallas(tri_packed, x, y, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def _make_cluster_bounds(tri_packed):
    tp = np.asarray(tri_packed)
    v = np.stack(
        [tp[:, 0:3], tp[:, 0:3] + tp[:, 3:6], tp[:, 0:3] + tp[:, 6:9]], axis=1
    )
    n_clusters = -(-tp.shape[0] // 64)
    cb = np.empty((n_clusters, 6), np.float32)
    for ci in range(n_clusters):
        g = v[ci * 64:(ci + 1) * 64].reshape(-1, 3)
        cb[ci, 0:3] = g.min(axis=0)
        cb[ci, 3:6] = g.max(axis=0)
    return jnp.asarray(cb)


def test_plucker_culled_noorder_matches(scene_rays):
    """The production shape (cluster_bounds given, tri_order None, positional
    winner ids) must agree with brute force."""
    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )


def test_plucker_dead_lanes(scene_rays):
    """tmax = -inf lanes (dead wavefront lanes) flag no clusters; LIVE lanes
    sharing their rows must still get exact results.  (Dead-lane outputs are
    garbage by contract — device_scene.intersect masks them to -1.)"""
    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    n = ray_o.shape[0]
    active = np.zeros(n, bool)
    active[::2] = True
    from radish_pt_tpu.accel.pallas_kernels import FLT_MAX
    tmax = jnp.where(jnp.asarray(active), FLT_MAX, -FLT_MAX)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, _ = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, tmax=tmax, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(p1)[active], np.asarray(p0)[active]
    )


def test_plucker_culled_noorder_occlusion_matches(scene_rays):
    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_plucker_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_compact_matches_brute(scene_rays):
    """The compacted work-list kernel agrees with brute force (exact prim
    parity on random rays)."""
    from radish_pt_tpu.accel.pallas_kernels import intersect_plucker_compact

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )


@pytest.mark.parametrize("fan", [2, 3, 4])
def test_compact_fan_matches_fan1(scene_rays, fan):
    """fan>1 (multiple work items per grid step) is a pure scheduling change:
    results are identical to fan=1 — including odd fan, which exercises the
    work-list padding."""
    from radish_pt_tpu.accel.pallas_kernels import (
        intersect_plucker_compact, occlusion_plucker_compact)

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0 = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    p1, d1 = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True, fan=fan
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = occlusion_plucker_compact(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    o1 = occlusion_plucker_compact(
        tri_packed, x, y, cluster_bounds=cb, interpret=True, fan=fan
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_compact_overflow_falls_back_dense(scene_rays):
    """work_per_row smaller than the flagged count must trigger the dense
    fallback (lax.cond) and still return exact results."""
    from radish_pt_tpu.accel.pallas_kernels import intersect_plucker_compact

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, _ = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True,
        work_per_row=1,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


def test_compact_with_order_and_dead_lanes(scene_rays):
    """tri_order remap + dead lanes (tmax = -inf) through the compact path."""
    from radish_pt_tpu.accel.pallas_kernels import (
        FLT_MAX, intersect_plucker_compact)

    tri_packed, ray_o, ray_d = scene_rays
    rng = np.random.default_rng(11)
    order = jnp.asarray(
        rng.permutation(tri_packed.shape[0]).astype(np.int32))
    tp_perm = tri_packed[order]
    cb = _make_cluster_bounds(tp_perm)
    n = ray_o.shape[0]
    active = np.zeros(n, bool)
    active[::3] = True
    tmax = jnp.where(jnp.asarray(active), FLT_MAX, -FLT_MAX)
    p0, _, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, _ = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, tri_order=order, cluster_bounds=cb,
        tmax=tmax, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(p1)[active], np.asarray(p0)[active]
    )


def test_compact_occlusion_matches_brute(scene_rays):
    from radish_pt_tpu.accel.pallas_kernels import occlusion_plucker_compact

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_plucker_compact(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_sphere_path_matches_brute(scene_rays, monkeypatch):
    """Force the MXU sphere prepass on the small fixture (monkeypatched
    cluster threshold): intersect + occlusion + dead lanes + tri_order all
    agree with brute force through the sphere path."""
    import radish_pt_tpu.accel.pallas_kernels as pk

    monkeypatch.setattr(pk, "_PER_RAY_PREPASS_MAX", 0)
    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = pk.intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = pk.occlusion_plucker_compact(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

    # dead lanes + permuted storage order
    order = jnp.asarray(
        rng.permutation(tri_packed.shape[0]).astype(np.int32))
    cb_perm = _make_cluster_bounds(tri_packed[order])
    active = np.zeros(ray_o.shape[0], bool)
    active[::3] = True
    tmax = jnp.where(jnp.asarray(active), pk.FLT_MAX, -pk.FLT_MAX)
    p2, _ = pk.intersect_plucker_compact(
        tri_packed, ray_o, ray_d, tri_order=order, cluster_bounds=cb_perm,
        tmax=tmax, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(p2)[active], np.asarray(p0)[active]
    )


def test_sphere_flags_superset_of_slab():
    """The sphere prepass flags must be a superset of the exact slab flags
    (bounding sphere contains the AABB; conservative t window): a false
    miss in the prepass would silently drop intersections."""
    import radish_pt_tpu.accel.pallas_kernels as pk

    rng = np.random.default_rng(9)
    centers = rng.uniform(-5, 5, size=(16, 1, 3)).repeat(64, axis=0)
    soup = (centers + rng.normal(scale=0.3, size=(1024, 3, 3))).astype(
        np.float32)
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    ray_o = jnp.asarray(rng.uniform(-8, 8, size=(256, 3)).astype(np.float32))
    ray_d = rng.normal(size=(256, 3)).astype(np.float32)
    ray_d = jnp.asarray(ray_d / np.linalg.norm(ray_d, axis=-1, keepdims=True))
    cb = jnp.asarray(_make_cluster_bounds(tri_packed))
    rows = -(-ray_o.shape[0] // 128)
    o, d, tm = pk._pad_rays(ray_o, ray_d, None, rows * 128)
    slab = np.asarray(pk._row_flags(cb, o, d, tm, rows))
    v0 = tri_packed[:, 0:3]
    center = 0.5 * (v0.min(axis=0) + v0.max(axis=0))
    sphere = np.asarray(
        pk._sphere_flags(cb, center, o - center, d, tm, rows, 128,
                         interpret=True)
    )[:, :slab.shape[1]]
    assert (sphere | slab == sphere).all()  # superset
    # and not trivially all-true (the test would be vacuous)
    assert sphere.mean() < 0.9


def test_coarsened_prepass_conservative(scene_rays):
    """Coarsened cull-unit flags must be a superset of the fine flags
    (merging AABBs can only widen the slab test)."""
    import radish_pt_tpu.accel.pallas_kernels as pk

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    rows = -(-ray_o.shape[0] // 128)
    o, d, tm = pk._pad_rays(ray_o, ray_d, None, rows * 128)
    fine = np.asarray(pk._row_flags(cb, o, d, tm, rows))
    g = 3
    coarse = np.asarray(
        pk._row_flags(pk._coarsen_bounds(cb, g), o, d, tm, rows)
    )
    C = fine.shape[1]
    fine_up = np.zeros_like(coarse)
    for c in range(C):
        fine_up[:, c // g] |= fine[:, c]
    assert (coarse | fine_up == coarse).all()  # superset
    # padding units (inverted boxes) never flag
    if coarse.shape[1] * g > C:
        pass  # padded into last unit; covered by superset check


def test_compact_coarsened_big_scene_matches_brute():
    """>16,384-tri scene (C_fine > _PER_RAY_PREPASS_MAX) exercises the
    coarsened cull units (g > 1): exact prim parity vs brute force."""
    from radish_pt_tpu.accel.pallas_kernels import (
        _PER_RAY_PREPASS_MAX, intersect_plucker_compact)

    rng = np.random.default_rng(5)
    n_tris = _PER_RAY_PREPASS_MAX * 64 + 777  # forces g == 2
    centers = rng.uniform(-3, 3, size=(n_tris, 1, 3))
    soup = (centers + rng.normal(scale=0.05, size=(n_tris, 3, 3))).astype(
        np.float32
    )
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    cb = _make_cluster_bounds(tri_packed)
    assert cb.shape[0] > _PER_RAY_PREPASS_MAX

    n = 64
    ray_o = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    targets = soup.mean(axis=1)[rng.integers(0, n_tris, n)]
    ray_d = targets - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_o = jnp.asarray(ray_o)
    ray_d = jnp.asarray(ray_d.astype(np.float32))

    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=jnp.asarray(cb),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


def test_pallas_occlusion_matches_xla(scene_rays):
    tri_packed, ray_o, ray_d = scene_rays
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_brute_pallas(tri_packed, x, y, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_compact_tuning_cli_spec():
    """--compact-tuning spec parsing mutates the trace-time tuning dict and
    rejects unknown keys."""
    from radish_pt_tpu.accel.pallas_kernels import COMPACT_TUNING
    from radish_pt_tpu.cli import apply_compact_tuning

    saved = dict(COMPACT_TUNING)
    try:
        apply_compact_tuning("group=2, fan=4,work_per_row=40")
        assert COMPACT_TUNING == {"group": 2, "fan": 4, "work_per_row": 40}
        with pytest.raises(SystemExit):
            apply_compact_tuning("bogus=1")
    finally:
        COMPACT_TUNING.clear()
        COMPACT_TUNING.update(saved)


def test_mxu_engine_dispatch():
    """_mxu_engines maps each intersector string to its kernel pair and
    only pallas_compact carries tuning kwargs."""
    from radish_pt_tpu.accel import pallas_kernels as pk
    from radish_pt_tpu.scene.device_scene import DeviceScene, _mxu_engines

    ds = DeviceScene(intersector="pallas_mxu")
    assert _mxu_engines(ds) == (
        pk.intersect_plucker_pallas, pk.occlusion_plucker_pallas,
        {"cluster_sub": 64})
    ds = DeviceScene(intersector="pallas_quad")
    assert _mxu_engines(ds) == (
        pk.intersect_quad_pallas, pk.occlusion_quad_pallas,
        {"cluster_sub": 64})
    ds = DeviceScene(intersector="pallas_compact")
    isect, occl, tuning = _mxu_engines(ds)
    assert isect is pk.intersect_plucker_compact
    assert occl is pk.occlusion_plucker_compact
    assert tuning == pk.COMPACT_TUNING and tuning is not pk.COMPACT_TUNING


def test_precomputed_coeffs_parity(scene_rays):
    """Build-time hoisted decision planes give bitwise-identical results to
    inline coefficient prep, for the scan, occlusion, and compact kernels."""
    from radish_pt_tpu.accel.pallas_kernels import (
        intersect_plucker_compact, occlusion_plucker_compact,
        precompute_sweep_coeffs)

    tri_packed, ray_o, ray_d = scene_rays
    cb = _make_cluster_bounds(tri_packed)
    co, ce = precompute_sweep_coeffs(tri_packed)

    p0, d0 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True)
    p1, d1 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))

    y = ray_o + ray_d * 3.0
    o0 = occlusion_plucker_pallas(
        tri_packed, ray_o, y, cluster_bounds=cb, interpret=True)
    o1 = occlusion_plucker_pallas(
        tri_packed, ray_o, y, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

    p2, d2 = intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p0))
    o2 = occlusion_plucker_compact(
        tri_packed, ray_o, y, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o0))


def test_precomputed_coeffs_shape_fallback(scene_rays):
    """Mismatched precomputed coeffs (stale chunk tuning) fall back to
    inline prep instead of producing garbage."""
    from radish_pt_tpu.accel.pallas_kernels import precompute_sweep_coeffs

    tri_packed, ray_o, ray_d = scene_rays
    co, ce = precompute_sweep_coeffs(tri_packed)
    bad = co[:, : co.shape[1] // 2, :]  # wrong stacked-plane width
    p0, d0 = intersect_plucker_pallas(tri_packed, ray_o, ray_d, interpret=True)
    p1, d1 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, coeffs_pre=bad, center_pre=ce,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))


def test_scan_sphere_prepass_matches_brute(scene_rays, monkeypatch):
    """Force the SCAN engines' MXU sphere prepass (monkeypatched
    _SCAN_SPHERE_MIN_C) on the small fixture: intersect + occlusion +
    dead lanes all agree with brute force — the sphere flags are a strict
    superset of the slab flags, so winners must be identical."""
    import radish_pt_tpu.accel.pallas_kernels as pk

    monkeypatch.setattr(pk, "_SCAN_SPHERE_MIN_C", 0)
    tri_packed, ray_o, ray_d = scene_rays
    cb = jnp.asarray(_make_cluster_bounds(tri_packed))
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = pk.intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, size=(64, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = pk.occlusion_plucker_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

    # dead lanes (tmax = -FLT_MAX) stay dead through the sphere prepass
    active = np.zeros(ray_o.shape[0], bool)
    active[::3] = True
    tmax = jnp.where(jnp.asarray(active), pk.FLT_MAX, -pk.FLT_MAX)
    p2, _ = pk.intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, tmax=tmax,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(p2)[active], np.asarray(p0)[active]
    )


def test_degenerate_masked_segments_flag_nothing():
    """A masked shadow lane (zero-length segment, tm <= 0) must flag NO
    cull units through the sphere prepass — dead-lane packing is what
    makes late-bounce occlusion nearly free, and a degenerate direction
    would otherwise zero the quadratic features and flag every unit."""
    import radish_pt_tpu.accel.pallas_kernels as pk

    rng = np.random.default_rng(2)
    cb = jnp.asarray(
        np.stack([rng.uniform(-5, 0, (32, 3)), rng.uniform(0, 5, (32, 3))],
                 axis=1).reshape(32, 6).astype(np.float32))
    center = jnp.zeros(3, jnp.float32)
    n = 128
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = jnp.zeros((n, 3), jnp.float32)  # degenerate normalized segment
    tm = jnp.full((n,), -1e-4)  # dist - eps of a zero-length segment
    flags = np.asarray(
        pk._sphere_flags(cb, center, o, d, tm, 1, 128, interpret=True)
    )
    assert not flags.any()


# ---------------------------------------------------------------------------
# banded multi-cluster kernel (round 3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def big_scene_rays():
    """A multi-cluster scene (5 x 64-tri clusters) with enough rays that
    128-lane rows span several bands with DIFFERENT flagged clusters."""
    rng = np.random.default_rng(33)
    centers = rng.uniform(-4, 4, size=(300, 1, 3))
    soup = (centers + rng.normal(scale=0.4, size=(300, 3, 3))).astype(
        np.float32
    )
    # spatial sort (x-major) so consecutive 64-groups make tight clusters
    order = np.argsort(soup[:, :, 0].mean(axis=1), kind="stable")
    soup = soup[order]
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    n = 384
    ray_o = rng.uniform(-7, 7, size=(n, 3)).astype(np.float32)
    targets = soup.mean(axis=1)[rng.integers(0, 300, n)]
    ray_d = targets - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    return tri_packed, jnp.asarray(ray_o), jnp.asarray(ray_d.astype(np.float32))


@pytest.mark.parametrize("G", [1, 4, 8])
def test_band_matches_brute(big_scene_rays, G):
    """The banded kernel is the plain Plücker sweep restricted per band to
    the band's own flagged clusters: exact prim parity with brute force at
    any band count (conservative culling; HIGHEST-precision planes)."""
    from radish_pt_tpu.accel.pallas_kernels import intersect_plucker_band

    tri_packed, ray_o, ray_d = big_scene_rays
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_band(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True, G=G
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    assert hits.mean() > 0.3
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=5e-3
    )


def test_band_with_order_and_dead_lanes(big_scene_rays):
    """tri_order remap + dead lanes (tmax = -inf) through the banded path:
    live lanes exact, dead lanes NULL-masked by the caller contract."""
    from radish_pt_tpu.accel.pallas_kernels import (
        FLT_MAX, intersect_plucker_band)

    tri_packed, ray_o, ray_d = big_scene_rays
    t = tri_packed.shape[0]
    rng = np.random.default_rng(11)
    order = jnp.asarray(rng.permutation(t).astype(np.int32))
    tp = jnp.asarray(np.asarray(tri_packed)[np.asarray(order)])
    cb = _make_cluster_bounds(tp)
    n = ray_o.shape[0]
    active = np.zeros(n, bool)
    active[::3] = True
    tmax = jnp.where(jnp.asarray(active), FLT_MAX, -FLT_MAX)
    p0, _, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, _ = intersect_plucker_band(
        tri_packed, ray_o, ray_d, tri_order=order, cluster_bounds=cb,
        tmax=tmax, interpret=True, G=8,
    )
    np.testing.assert_array_equal(
        np.asarray(p1)[active], np.asarray(p0)[active]
    )


@pytest.mark.parametrize("G", [4, 16])
def test_band_occlusion_matches_brute(big_scene_rays, G):
    from radish_pt_tpu.accel.pallas_kernels import occlusion_plucker_band

    tri_packed, ray_o, ray_d = big_scene_rays
    cb = _make_cluster_bounds(tri_packed)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_plucker_band(
        tri_packed, x, y, cluster_bounds=cb, interpret=True, G=G
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_band_precomputed_coeffs_match(big_scene_rays):
    """Build-time band coefficient blocks (precompute_band_coeffs) must give
    identical results to inline prep."""
    from radish_pt_tpu.accel.pallas_kernels import (
        intersect_plucker_band, precompute_band_coeffs)

    tri_packed, ray_o, ray_d = big_scene_rays
    cb = _make_cluster_bounds(tri_packed)
    coeffs, center = precompute_band_coeffs(tri_packed)
    p0, d0 = intersect_plucker_band(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    p1, d1 = intersect_plucker_band(
        tri_packed, ray_o, ray_d, cluster_bounds=cb,
        coeffs_pre=coeffs, center_pre=center, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    # eager vs jit coefficient prep round differently; dist is selector
    # grade (64-ulp key quantization ~ 2^-17 relative)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-5)


def test_band_multipass_matches(monkeypatch):
    """Force the pass split (P > 1) by shrinking the per-pass VMEM budget:
    results must be identical to the single-pass run (hit state carries
    across pass-resident sub-tables).  Needs > 16 clusters (a pass is a
    whole number of 16-bit mask words), so it builds its own scene."""
    from radish_pt_tpu.accel import pallas_kernels as pk

    rng = np.random.default_rng(44)
    centers = rng.uniform(-4, 4, size=(2100, 1, 3))
    soup = (centers + rng.normal(scale=0.25, size=(2100, 3, 3))).astype(
        np.float32
    )
    order = np.argsort(soup[:, :, 0].mean(axis=1), kind="stable")
    soup = soup[order]
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    n = 256
    ray_o = rng.uniform(-7, 7, size=(n, 3)).astype(np.float32)
    targets = soup.mean(axis=1)[rng.integers(0, 2100, n)]
    ray_d = targets - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_o = jnp.asarray(ray_o)
    ray_d = jnp.asarray(ray_d.astype(np.float32))

    cb = _make_cluster_bounds(tri_packed)
    p0, d0 = pk.intersect_plucker_band(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    p_ref, _, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p_ref))
    assert pk._band_pass_split(cb.shape[0])[0] == 1
    # one cluster is 16*256*4 B = 16 KB; 256 KB budget -> 16 clusters/pass
    monkeypatch.setattr(pk, "BAND_PASS_BYTES", 256 << 10)
    P, Cp, words = pk._band_pass_split(cb.shape[0])
    assert P >= 3
    p1, d1 = pk.intersect_plucker_band(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True, G=4
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-5)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = pk.occlusion_plucker_band(
        tri_packed, x, y, cluster_bounds=cb, interpret=True, G=4
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_plucker_bf16x6_matches_brute():
    """Above PLUCKER_BF16X3_MAX_TRIS the linear engines auto-select the
    bf16x6 single-pass emulation (3-way split, 6 K-stacked product terms):
    f32-grade accuracy means EXACT winner parity on random rays."""
    from radish_pt_tpu.accel import pallas_kernels as pk

    rng = np.random.default_rng(55)
    nt = 2500
    centers = rng.uniform(-4, 4, size=(nt, 1, 3))
    soup = (centers + rng.normal(scale=0.3, size=(nt, 3, 3))).astype(
        np.float32
    )
    order = np.argsort(soup[:, :, 0].mean(axis=1), kind="stable")
    soup = soup[order]
    tri_packed = jnp.asarray(trv.pack_tris(soup))
    n = 256
    ray_o = rng.uniform(-7, 7, size=(n, 3)).astype(np.float32)
    targets = soup.mean(axis=1)[rng.integers(0, nt, n)]
    ray_d = targets - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_o = jnp.asarray(ray_o)
    ray_d = jnp.asarray(ray_d.astype(np.float32))
    cb = _make_cluster_bounds(tri_packed)

    assert pk._auto_prec(nt) is False  # mid tier: HIGHEST
    assert pk._auto_prec(pk.BIG_SCENE_TRIS + 1) == "x6"
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    p1, d1 = intersect_plucker_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True,
        bf16x3="x6",
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    hits = np.asarray(p0) >= 0
    assert hits.mean() > 0.3
    np.testing.assert_allclose(
        np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=1e-4
    )

    x = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    o1 = occlusion_plucker_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True, bf16x3="x6"
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

    # the compact work-list engine shares the precision plumbing
    p2, _ = pk.intersect_plucker_compact(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True,
        bf16x3="x6",
    )
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p0))


@pytest.mark.slow
def test_wavefront_launch_splitting(big_scene_rays, monkeypatch):
    """1080p robustness: wavefronts above MAX_LANES_PER_LAUNCH /
    COMPACT_MAX_LANES / BAND_MAX_LANES are swept in sub-launches (VMEM
    hit-state scratch is sized per launch).  Exercise the split path on
    every engine by shrinking the caps below the wavefront size and
    asserting identical results (a real 1920x1080 frame at 2.07M lanes
    takes the same code path with the production caps — the TPU proof run
    is recorded in BASELINE.md round 3)."""
    from radish_pt_tpu.accel import pallas_kernels as pk

    tri_packed, ray_o, ray_d = big_scene_rays
    cb = _make_cluster_bounds(tri_packed)
    # tile to ~6k lanes so a 2048 cap forces 3 launches
    reps = 16
    o = jnp.tile(ray_o, (reps, 1))
    d = jnp.tile(ray_d, (reps, 1))
    p0, d0 = pk.intersect_plucker_pallas(
        tri_packed, o, d, cluster_bounds=cb, interpret=True
    )
    o2 = jnp.tile(ray_o, (reps, 1)) * 0 + o  # fresh arrays
    monkeypatch.setattr(pk, "MAX_LANES_PER_LAUNCH", 2048)
    monkeypatch.setattr(pk, "COMPACT_MAX_LANES", 2048)
    monkeypatch.setattr(pk, "BAND_MAX_LANES", 2048)
    p1, d1 = pk.intersect_plucker_pallas(
        tri_packed, o2, d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))

    pc, _ = pk.intersect_plucker_compact(
        tri_packed, o, d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(p0))
    pb, _ = pk.intersect_plucker_band(
        tri_packed, o, d, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(p0))

    x = o[:2048 * 2, :]
    y = x + d[:2048 * 2, :] * 20.0
    oc0 = pk.occlusion_plucker_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    monkeypatch.setattr(pk, "MAX_LANES_PER_LAUNCH", 1024)
    oc1 = pk.occlusion_plucker_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(oc1), np.asarray(oc0))


def test_quad_precomputed_coeffs_match(big_scene_rays):
    """Build-time quad planes (precompute_quad_coeffs; q6 stored, closest
    hit slices 5 planes per cluster) match inline prep."""
    from radish_pt_tpu.accel import pallas_kernels as pk

    tri_packed, ray_o, ray_d = big_scene_rays
    cb = _make_cluster_bounds(tri_packed)
    co, ce = pk.precompute_quad_coeffs(tri_packed)
    p0, d0 = intersect_quad_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb, interpret=True
    )
    p1, d1 = intersect_quad_pallas(
        tri_packed, ray_o, ray_d, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=2e-5)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    o0 = occlusion_quad_pallas(
        tri_packed, x, y, cluster_bounds=cb, interpret=True
    )
    o1 = occlusion_quad_pallas(
        tri_packed, x, y, cluster_bounds=cb,
        coeffs_pre=co, center_pre=ce, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


def test_quad_padded_rows_vs_brute(big_scene_rays):
    """Quad-vs-brute parity on a tri count that is NOT a multiple of the
    cull-cluster size (300 tris -> 20 zero-padded coefficient rows).

    Regression test: zero-padding the COEFFICIENT rows (instead of padding
    tri_packed with degenerate triangles) zeroes the q4 eps plane, and the
    inclusive >= 0 edge rule then accepts every pad row as a hit at t = 0 —
    all closest hits collapse to NULL and every segment reads occluded."""
    tri_packed, ray_o, ray_d = big_scene_rays
    assert tri_packed.shape[0] % 64 != 0  # fixture must exercise pad rows
    cb = _make_cluster_bounds(tri_packed)
    p0, d0, _ = trv.intersect_brute(tri_packed, ray_o, ray_d)
    for kw in ({}, {"cluster_bounds": cb}):
        p1, d1 = intersect_quad_pallas(
            tri_packed, ray_o, ray_d, interpret=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
        hits = np.asarray(p0) >= 0
        assert hits.mean() > 0.3
        np.testing.assert_allclose(
            np.asarray(d1)[hits], np.asarray(d0)[hits], rtol=3e-2
        )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-6, 6, size=(256, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-6, 6, size=(256, 3)).astype(np.float32))
    o0 = trv.occlusion_brute(tri_packed, x, y)
    assert 0.05 < np.asarray(o0).mean() < 0.95
    for kw in ({}, {"cluster_bounds": cb}):
        o1 = occlusion_quad_pallas(tri_packed, x, y, interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))

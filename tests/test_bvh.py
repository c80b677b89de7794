"""BVH builder layout invariants + traversal-vs-brute-force oracle tests
(SURVEY.md §4: the reference's naiveIntersect is the oracle pattern)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.accel import traverse as trv
from radish_pt_tpu.accel.bvh import NULL_PRIMITIVE, build_bvh


def random_soup(rng, num_tris=64, spread=4.0):
    centers = rng.uniform(-spread, spread, size=(num_tris, 1, 3))
    tris = centers + rng.normal(scale=0.4, size=(num_tris, 3, 3))
    return tris.astype(np.float32).reshape(-1, 3)


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(42)
    return random_soup(rng, 64)


@pytest.fixture(scope="module")
def bvh(soup):
    return build_bvh(soup, leaf_size=4)


def test_bvh_layout_invariants(soup, bvh):
    t = soup.shape[0] // 3
    # every primitive appears exactly once across the leaf map
    mapped = bvh.leaf_map[bvh.leaf_map != NULL_PRIMITIVE]
    assert sorted(mapped.tolist()) == list(range(t))
    for d in range(6):
        # every leaf row referenced exactly once per direction order
        leaves = bvh.node_leaf[d][bvh.node_leaf[d] != NULL_PRIMITIVE]
        assert sorted(leaves.tolist()) == list(range(bvh.num_leaves))
        # miss links point strictly forward and within [1, size]
        miss = bvh.node_miss[d]
        assert (miss > np.arange(bvh.size)).all()
        assert (miss <= bvh.size).all()
        assert ((bvh.node_aabb[d] >= 0) & (bvh.node_aabb[d] < bvh.size)).all()


def test_bvh_leaf_size_one_is_reference_layout(soup):
    # leaf_size=1 degenerates to the 2n-1 one-prim-leaf layout of the
    # reference builder (bvh.cpp:17)
    b1 = build_bvh(soup, leaf_size=1)
    t = soup.shape[0] // 3
    assert b1.size == 2 * t - 1
    assert b1.num_leaves == t


def test_bvh_root_bound_contains_all(soup, bvh):
    v = soup.reshape(-1, 3)
    for d in range(6):
        root = bvh.node_aabb[d][0]
        assert (bvh.bounds_min[root] <= v.min(0) + 1e-5).all()
        assert (bvh.bounds_max[root] >= v.max(0) - 1e-5).all()


@pytest.mark.slow
def test_traversal_matches_brute_force(soup, bvh):
    rng = np.random.default_rng(3)
    n = 256
    ray_o = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    # aim at jittered triangle centroids so a good fraction of rays hit
    centroids = soup.reshape(-1, 3, 3).mean(axis=1)
    targets = centroids[rng.integers(0, len(centroids), n)] + rng.normal(
        scale=0.3, size=(n, 3)
    )
    ray_d = (targets - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    tri_v = jnp.asarray(soup.reshape(-1, 3, 3))
    packed_b = jnp.asarray(trv.pack_bvh(bvh))
    bp, bd, bb = trv.intersect_brute(tri_v, jnp.asarray(ray_o), jnp.asarray(ray_d))
    tp, td, tb = trv.intersect_bvh(
        jnp.asarray(bvh.leaf_tris), jnp.asarray(bvh.leaf_map), packed_b,
        jnp.asarray(ray_o), jnp.asarray(ray_d),
    )
    bp, bd = np.asarray(bp), np.asarray(bd)
    tp, td = np.asarray(tp), np.asarray(td)
    hit_rate = (bp != NULL_PRIMITIVE).mean()
    assert hit_rate > 0.1  # sanity: the scene is actually hit
    np.testing.assert_array_equal(tp, bp)
    hits = bp != NULL_PRIMITIVE
    np.testing.assert_allclose(td[hits], bd[hits], rtol=1e-4)


@pytest.mark.slow
def test_occlusion_matches_brute_force(soup, bvh):
    rng = np.random.default_rng(4)
    n = 128
    x = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    y = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    tri_v = jnp.asarray(soup.reshape(-1, 3, 3))
    packed_b = jnp.asarray(trv.pack_bvh(bvh))
    ob = np.asarray(trv.occlusion_brute(tri_v, jnp.asarray(x), jnp.asarray(y)))
    ot = np.asarray(
        trv.occlusion_bvh(
            jnp.asarray(bvh.leaf_tris), jnp.asarray(bvh.leaf_map), packed_b,
            jnp.asarray(x), jnp.asarray(y),
        )
    )
    assert ob.mean() > 0.05
    np.testing.assert_array_equal(ot, ob)


def test_slab_test_basics():
    bmin = jnp.array([[0.0, 0.0, 0.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    # ray toward the box
    hit, t = trv.slab_test(bmin, bmax, jnp.array([[-1.0, 0.5, 0.5]]), jnp.array([[1.0, 0.0, 0.0]]))
    assert bool(hit[0]) and float(t[0]) == pytest.approx(1.0)
    # ray away from the box
    hit, _ = trv.slab_test(bmin, bmax, jnp.array([[-1.0, 0.5, 0.5]]), jnp.array([[-1.0, 0.0, 0.0]]))
    assert not bool(hit[0])
    # origin inside: hit with negative t_near
    hit, t = trv.slab_test(bmin, bmax, jnp.array([[0.5, 0.5, 0.5]]), jnp.array([[1.0, 0.0, 0.0]]))
    assert bool(hit[0]) and float(t[0]) < 0
    # axis-aligned ray lying in a slab plane (0 * inf nan case)
    hit, _ = trv.slab_test(bmin, bmax, jnp.array([[0.0, 0.5, 0.5]]), jnp.array([[1.0, 0.0, 0.0]]))
    assert bool(hit[0])


def test_moller_trumbore_barycentrics():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, dist, bary = trv.moller_trumbore(v0, v1, v2, o, d)
    assert bool(hit[0])
    assert float(dist[0]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(bary[0]), [0.25, 0.25], atol=1e-6)
    # backface also hits (sign-normalized determinant)
    hit2, _, _ = trv.moller_trumbore(v0, v1, v2, o, -d)
    assert not bool(hit2[0])  # pointing away -> no hit


def test_dir_class_convention():
    # matches DevScene::getMTBVHId (scene.h:114-129)
    d = jnp.array(
        [
            [1.0, 0.1, 0.1],
            [-1.0, 0.1, 0.1],
            [0.1, 1.0, 0.1],
            [0.1, -1.0, 0.1],
            [0.1, 0.1, 1.0],
            [0.1, 0.1, -1.0],
        ]
    )
    np.testing.assert_array_equal(np.asarray(trv.get_dir_class(d)), [0, 1, 2, 3, 4, 5])

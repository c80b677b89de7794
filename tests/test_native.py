"""Native C++ components: parity with the numpy/Python oracles."""

import os

import numpy as np
import pytest

from radish_pt_tpu.native import load_library, native_build_bvh, native_load_obj

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def lib():
    lib = load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_native_bvh_matches_numpy(lib):
    from radish_pt_tpu.accel.bvh import build_bvh_numpy

    rng = np.random.default_rng(9)
    centers = rng.uniform(-4, 4, size=(200, 1, 3))
    soup = (centers + rng.normal(scale=0.4, size=(200, 3, 3))).astype(np.float32)
    soup = soup.reshape(-1, 3)

    ref = build_bvh_numpy(soup, leaf_size=8)
    out = native_build_bvh(soup, leaf_size=8)
    assert out is not None
    bmin, bmax, leaf, aabb, miss, ltris, lmap, depth = out

    assert bmin.shape == ref.bounds_min.shape
    np.testing.assert_allclose(bmin, ref.bounds_min, rtol=1e-6)
    np.testing.assert_allclose(bmax, ref.bounds_max, rtol=1e-6)
    np.testing.assert_array_equal(leaf, ref.node_leaf)
    np.testing.assert_array_equal(aabb, ref.node_aabb)
    np.testing.assert_array_equal(miss, ref.node_miss)
    np.testing.assert_allclose(ltris, ref.leaf_tris, rtol=1e-6)
    np.testing.assert_array_equal(lmap, ref.leaf_map)
    assert depth == ref.depth


def test_native_obj_matches_python(lib):
    from radish_pt_tpu.scene.obj_loader import load_obj_py

    for name in ("plane.obj", "cube.obj", "teapot.obj"):
        path = os.path.join(SCENES, "models", name)
        ref = load_obj_py(path)
        out = native_load_obj(path)
        assert out is not None
        v, n, uv = out
        np.testing.assert_allclose(v, ref.vertices, rtol=1e-6)
        np.testing.assert_allclose(n, ref.normals, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(uv, ref.texcoords, rtol=1e-6)


def test_native_obj_quad_negative_indices(lib, tmp_path):
    from radish_pt_tpu.scene.obj_loader import load_obj_py

    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4/-4 -3/-3 -2/-2 -1/-1\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n")
    # move vt before f for well-formedness
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\nf -4/-4 -3/-3 -2/-2 -1/-1\n")
    ref = load_obj_py(str(p))
    v, n, uv = native_load_obj(str(p))
    np.testing.assert_allclose(v, ref.vertices)
    np.testing.assert_allclose(uv, ref.texcoords)


def test_native_cluster_cuts_matches_numpy():
    """The C++ cluster-cut DP is the same algorithm (same windows, same
    tie-breaking) as the numpy fallback — cuts must be identical."""
    import numpy as np

    from radish_pt_tpu import native
    from radish_pt_tpu.scene import build as sbuild

    if native.load_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    centers = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.4, (3000, 3)).astype(np.float32)
    order = np.argsort(centers[:, 0], kind="stable")
    pmin = (centers - half)[order]
    pmax = (centers + half)[order]
    lam = 0.005 * sbuild._box_area(pmin.min(axis=0), pmax.max(axis=0))
    got = native.native_cluster_cuts(pmin, pmax, 64, lam, 1024)
    # run the numpy DP by disabling the native path
    import unittest.mock as mock

    with mock.patch.object(native, "load_library", lambda: None):
        want = sbuild._cluster_cuts(pmin, pmax, sub=64, lam_frac=0.005,
                                    chunk=1024)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

"""Unit tests for the jnp math library (SURVEY.md §4: pure-function tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.utils import math as m


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = m.normalize(v)
    np.testing.assert_allclose(m.length(n), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(m.dot(n, n), [1.0, 1.0], atol=1e-6)


def test_hemioct_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(256, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.05  # upper hemisphere
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    enc = m.encode_normal_hemioct(jnp.asarray(v, jnp.float32))
    dec = np.asarray(m.decode_normal_hemioct(enc))
    np.testing.assert_allclose(dec, v, atol=1e-3)


def test_mis_heuristics():
    assert float(m.power_heuristic(1.0, 1.0)) == pytest.approx(0.5)
    assert float(m.balance_heuristic(1.0, 3.0)) == pytest.approx(0.25)
    assert float(m.power_heuristic(10.0, 0.1)) > 0.99


def test_triangle_area_normal():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    assert float(m.triangle_area(v0, v1, v2)) == pytest.approx(0.5)
    np.testing.assert_allclose(m.triangle_normal(v0, v1, v2), [0, 0, 1], atol=1e-6)


def test_sample_triangle_uniform_centroid():
    rng = np.random.default_rng(1)
    r = rng.random((4096, 2)).astype(np.float32)
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    pts = np.asarray(m.sample_triangle_uniform(v0, v1, v2, r[:, 0], r[:, 1]))
    # inside triangle
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()
    # mean at centroid
    np.testing.assert_allclose(pts.mean(0)[:2], [1 / 3, 1 / 3], atol=0.02)


def test_refract_matches_snell():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wi = m.normalize(jnp.array([[0.5, 0.0, 1.0]]))  # from above
    wt, ok = m.refract(n, wi, jnp.array([1.5]))
    assert bool(ok[0])
    sin_in = np.sqrt(1 - float(m.dot(n, wi)[0]) ** 2)
    sin_tr = np.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2)
    assert float(sin_tr) == pytest.approx(sin_in / 1.5, abs=1e-5)
    assert float(wt[0, 2]) < 0  # transmitted to other side


def test_refract_tir():
    n = jnp.array([[0.0, 0.0, 1.0]])
    # from inside glass at grazing angle -> TIR
    wi = m.normalize(jnp.array([[0.95, 0.0, -0.3]]))
    _, ok = m.refract(n, wi, jnp.array([1.5]))
    assert not bool(ok[0])


def test_fresnel_limits():
    # normal incidence from air into ior=1.5: R0 = ((1-1.5)/(2.5))^2 = 0.04
    f0 = float(m.fresnel(jnp.array([1.0]), jnp.array([1.5]))[0])
    assert f0 == pytest.approx(0.04, abs=1e-3)
    # grazing -> 1
    fg = float(m.fresnel(jnp.array([0.01]), jnp.array([1.5]))[0])
    assert fg > 0.9
    # TIR from inside
    ft = float(m.fresnel(jnp.array([-0.3]), jnp.array([1.5]))[0])
    assert ft == pytest.approx(1.0)


def test_cosine_hemisphere_distribution():
    rng = np.random.default_rng(2)
    r = rng.random((8192, 2)).astype(np.float32)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (8192, 3))
    d = np.asarray(m.cosine_sample_hemisphere(n, r[:, 0], r[:, 1]))
    assert (d[:, 2] >= -1e-6).all()
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert d[:, 2].mean() == pytest.approx(2 / 3, abs=0.02)


def test_pdf_area_to_solid_angle():
    pdf = m.pdf_area_to_solid_angle(
        jnp.array([1.0]),
        jnp.array([[0.0, 0.0, 0.0]]),
        jnp.array([[0.0, 0.0, 2.0]]),
        jnp.array([[0.0, 0.0, -1.0]]),
    )
    assert float(pdf[0]) == pytest.approx(4.0)  # r^2 / cos = 4 / 1


def test_utilhash_device_matches_host():
    vals = np.array([0, 1, 12345, 0xDEADBEEF], dtype=np.uint32)
    dev = np.asarray(m.utilhash(jnp.asarray(vals)))
    host = np.array([m.utilhash_np(int(v)) for v in vals], dtype=np.uint32)
    np.testing.assert_array_equal(dev, host)


def test_tonemap_ranges():
    c = jnp.array([[0.0, 1.0, 10.0]])
    for f in (m.filmic, m.aces):
        out = np.asarray(f(c))
        assert np.isfinite(out).all()
        assert (out >= -1e-3).all()
    ldr = np.asarray(m.hdr_to_ldr(jnp.array([[0.5, 2.0, 100.0]])))
    assert (ldr < 1.0).all() and (ldr >= 0).all()
    # roundtrip
    x = jnp.array([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(m.hdr_to_ldr(m.ldr_to_hdr(x)), x, atol=1e-3)


def test_to_sphere_plane_roundtrip():
    rng = np.random.default_rng(3)
    uv = rng.random((128, 2)).astype(np.float32) * 0.98 + 0.01
    d = m.to_sphere(jnp.asarray(uv))
    np.testing.assert_allclose(m.length(d), 1.0, atol=1e-5)
    uv2 = np.asarray(m.to_plane(d))
    np.testing.assert_allclose(uv2, uv, atol=1e-4)


def test_build_transformation_matrix():
    M = m.build_transformation_matrix([1, 2, 3], [0, 90, 0], [2, 2, 2])
    # point (1,0,0) scaled to (2,0,0), rotY90 -> (0,0,-2), translated
    p = M @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [1, 2, 1], atol=1e-5)


def test_local_to_world_preserves_z():
    n = m.normalize(jnp.array([[1.0, 2.0, 3.0]]))
    v = m.local_to_world(n, jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(v, n, atol=1e-6)

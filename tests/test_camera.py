"""Camera: ray generation and raster reprojection consistency."""

import numpy as np

import jax.numpy as jnp

from radish_pt_tpu.scene import camera as cm


def make_cam(**kw):
    args = dict(
        width=64,
        height=64,
        position=(0.0, 5.0, 18.0),
        rotation=(-90.0, 0.0, 0.0),
        fov_y=19.5,
        lens_radius=0.0,
        focal_dist=1.0,
    )
    args.update(kw)
    return cm.make_camera(**args)


def test_view_basis_orthonormal():
    cam = make_cam()
    v, u, r = np.asarray(cam.view), np.asarray(cam.up), np.asarray(cam.right)
    np.testing.assert_allclose(np.dot(v, u), 0, atol=1e-6)
    np.testing.assert_allclose(np.dot(v, r), 0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(v), 1, atol=1e-6)
    # rotation (-90,0,0): looking along -Z
    np.testing.assert_allclose(v, [0, 0, -1], atol=1e-6)


def test_center_pixel_ray_along_view():
    cam = make_cam()
    x = jnp.array([cam.width // 2])
    y = jnp.array([cam.height // 2])
    o, d = cm.pinhole_rays(cam, x, y)
    # center-ish pixel: direction within a pixel of the view axis
    assert float(jnp.dot(d[0], cam.view)) > 0.999
    np.testing.assert_allclose(np.asarray(o[0]), [0, 5, 18], atol=1e-6)


def test_raster_coord_roundtrip():
    """Project a point seen along pixel (x, y) back through the same camera ->
    same pixel (the motion-vector identity for a static camera)."""
    cam = make_cam()
    xs = jnp.array([5, 17, 32, 50, 62])
    ys = jnp.array([3, 21, 32, 44, 60])
    o, d = cm.pinhole_rays(cam, xs, ys)
    pts = o + d * 7.3  # arbitrary depth
    rc = np.asarray(cm.raster_coord(cam, pts))
    np.testing.assert_array_equal(rc[:, 0], np.asarray(xs))
    np.testing.assert_array_equal(rc[:, 1], np.asarray(ys))


def test_jitter_stays_inside_pixel():
    cam = make_cam()
    x = jnp.array([10, 10])
    y = jnp.array([20, 20])
    r = jnp.array([[0.01, 0.01, 0.5, 0.5], [0.99, 0.99, 0.5, 0.5]])
    ap = jnp.zeros((2, 2))
    o, d = cm.sample_rays(cam, x, y, r, p_aperture=ap)
    pts = o + d * 5.0
    rc = np.asarray(cm.raster_coord(cam, pts))
    np.testing.assert_array_equal(rc[:, 0], [10, 10])
    np.testing.assert_array_equal(rc[:, 1], [20, 20])


def test_dof_rays_converge_at_focal_plane():
    """Thin lens: rays through different lens points meet at the focal
    distance (sceneStructs.h:72-91 with the aperture wired in)."""
    cam = make_cam(lens_radius=0.5, focal_dist=10.0)
    x = jnp.array([32, 32])
    y = jnp.array([32, 32])
    r = jnp.full((2, 4), 0.5)
    ap = jnp.array([[-1.0, 0.0], [1.0, 0.0]])
    o, d = cm.sample_rays(cam, x, y, r, p_aperture=ap)
    o, d = np.asarray(o), np.asarray(d)
    assert np.abs(o[0] - o[1]).max() > 0.5  # distinct lens points
    # advance each ray to its focal-plane depth along view
    view = np.asarray(make_cam().view)
    t0 = 10.0 / np.dot(d[0], view)
    t1 = 10.0 / np.dot(d[1], view)
    p0 = o[0] + d[0] * t0
    p1 = o[1] + d[1] * t1
    np.testing.assert_allclose(p0, p1, atol=1e-3)


def test_update_camera_idempotent():
    cam = make_cam()
    cam2 = cm.update_camera(cam)
    np.testing.assert_allclose(np.asarray(cam.view), np.asarray(cam2.view), atol=1e-7)

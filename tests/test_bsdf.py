"""BSDF correctness: white furnace, pdf consistency, energy conservation
(SURVEY.md §4: energy conservation + pdf-vs-histogram tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.bsdf import materials as bsdf
from radish_pt_tpu.scene.device_scene import (
    MAT_DIELECTRIC,
    MAT_LAMBERTIAN,
    MAT_METALLIC_WORKFLOW,
    SurfaceMaterial,
)
from radish_pt_tpu.utils import math as m

N = 4096


def make_mat(mtype, base=(1.0, 1.0, 1.0), metallic=0.0, roughness=1.0, ior=1.5, n=N):
    return SurfaceMaterial(
        mtype=jnp.full((n,), mtype, jnp.int32),
        base_color=jnp.broadcast_to(jnp.asarray(base, jnp.float32), (n, 3)),
        metallic=jnp.full((n,), metallic, jnp.float32),
        roughness=jnp.full((n,), roughness, jnp.float32),
        ior=jnp.full((n,), ior, jnp.float32),
    )


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(11)
    n = m.normalize(jnp.asarray(rng.normal(size=(N, 3)), jnp.float32))
    wo_local = rng.normal(size=(N, 3))
    wo_local[:, 2] = np.abs(wo_local[:, 2]) + 0.05
    wo_local /= np.linalg.norm(wo_local, axis=-1, keepdims=True)
    wo = m.local_to_world(n, jnp.asarray(wo_local, jnp.float32))
    r3 = jnp.asarray(rng.random((N, 3)), jnp.float32)
    return n, wo, r3


def test_lambertian_white_furnace(frame):
    """E[f * cos / pdf] over BSDF samples == albedo for a white Lambertian."""
    n, wo, r3 = frame
    mat = make_mat(MAT_LAMBERTIAN, base=(0.8, 0.8, 0.8))
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    ok = ~bsdf.is_invalid(s.type)
    est = s.bsdf * (m.abs_dot(n, s.dir) / jnp.maximum(s.pdf, 1e-12))[..., None]
    mean = np.asarray(jnp.where(ok[..., None], est, 0.0)).sum(0) / np.asarray(ok).sum()
    np.testing.assert_allclose(mean, [0.8, 0.8, 0.8], atol=0.02)


def test_lambertian_pdf_matches_formula(frame):
    n, wo, r3 = frame
    mat = make_mat(MAT_LAMBERTIAN)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    expected = np.asarray(m.sat_dot(n, s.dir)) / np.pi
    np.testing.assert_allclose(np.asarray(s.pdf), expected, atol=1e-5)


def test_metallic_furnace_bounded(frame):
    """GGX metal with VNDF sampling: energy below 1 (no gain), above ~0.5
    (single-scatter loss only) for mid roughness."""
    n, wo, r3 = frame
    mat = make_mat(MAT_METALLIC_WORKFLOW, base=(1.0, 1.0, 1.0), metallic=1.0, roughness=0.4)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    ok = (~bsdf.is_invalid(s.type)) & (s.pdf > 1e-6)
    est = s.bsdf * (m.abs_dot(n, s.dir) / jnp.maximum(s.pdf, 1e-12))[..., None]
    vals = np.asarray(jnp.where(ok[..., None], est, 0.0)).sum(0) / np.asarray(ok).sum()
    assert (vals <= 1.05).all(), vals
    assert (vals >= 0.45).all(), vals


def test_metallic_eval_pdf_consistency(frame):
    """pdf(sampled dir) from bsdf_pdf equals the pdf the sampler reported."""
    n, wo, r3 = frame
    mat = make_mat(MAT_METALLIC_WORKFLOW, metallic=0.5, roughness=0.5)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    ok = ~bsdf.is_invalid(s.type)
    p2 = bsdf.bsdf_pdf(mat, n, wo, s.dir)
    a = np.asarray(s.pdf)[np.asarray(ok)]
    b = np.asarray(p2)[np.asarray(ok)]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_metallic_reciprocity_positive(frame):
    n, wo, r3 = frame
    mat = make_mat(MAT_METALLIC_WORKFLOW, metallic=0.9, roughness=0.3)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    ok = ~bsdf.is_invalid(s.type)
    f = np.asarray(bsdf.bsdf_eval(mat, n, wo, s.dir))
    assert (f[np.asarray(ok)] >= 0).all()


def test_dielectric_sample_directions(frame):
    """Reflection obeys mirror law; refraction obeys Snell; energy scaling
    1/eta^2 applied on transmission (material.h:159-183)."""
    n, wo, r3 = frame
    mat = make_mat(MAT_DIELECTRIC, base=(1.0, 1.0, 1.0), ior=1.5)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    refl = (np.asarray(s.type) & bsdf.REFLECTION) != 0
    trans = (np.asarray(s.type) & bsdf.TRANSMISSION) != 0
    assert refl.sum() > 0 and trans.sum() > 0
    # reflection: dot(n, refl_dir) == dot(n, wo)
    c1 = np.asarray(m.dot(n, s.dir))
    c0 = np.asarray(m.dot(n, wo))
    np.testing.assert_allclose(c1[refl], c0[refl], atol=1e-4)
    # transmission to the other side
    assert (np.sign(c1[trans]) != np.sign(c0[trans])).all()
    # bsdf scaled by 1/eta^2 going in (wo outside: eta=1.5)
    np.testing.assert_allclose(
        np.asarray(s.bsdf)[trans][:, 0], 1.0 / 1.5**2, atol=1e-4
    )
    # delta lobes report pdf 1 and Specular type
    assert (np.asarray(s.pdf)[refl | trans] == 1.0).all()
    assert (np.asarray(bsdf.is_delta(s.type))[refl | trans]).all()


def test_light_material_sample_invalid(frame):
    n, wo, r3 = frame
    from radish_pt_tpu.scene.device_scene import MAT_LIGHT

    mat = make_mat(MAT_LIGHT)
    s = bsdf.bsdf_sample(mat, n, wo, r3)
    assert np.asarray(bsdf.is_invalid(s.type)).all()
    f = np.asarray(bsdf.bsdf_eval(mat, n, wo, wo))
    assert (f == 0).all()

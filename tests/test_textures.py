"""End-to-end texture stack tests (VERDICT round 1, Weak #4): every branch of
``get_textured_material`` (scene.h:88-112 counterpart) against an independent
bilinear-sampler reimplementation, plus a golden low-spp render of the
textured showcase scene."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from radish_pt_tpu.scene import device_scene as dsc
from radish_pt_tpu.utils import math as m

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# material order in scenes/textured.txt
LIGHT, CHECKER_FLOOR, PROC_WALL, WHITE, MAPPED_METAL, BUMPY_WALL = range(6)

UP = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))


@pytest.fixture(scope="module")
def textured():
    from radish_pt_tpu.scene.build import load_scene

    ds, cam, desc = load_scene(os.path.join(SCENES, "textured.txt"))
    return ds, cam, desc


def _pil_bilinear(path, uvs, channel=None):
    """Independent reimplementation of the texture pipeline: PNG -> /255
    linear (no gamma), vertical flip (stbi_set_flip_vertically_on_load),
    bilinear with wraparound at texel centers (image.h:42-73)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    img = img[::-1]  # flip_vertical=True for material textures
    h, w = img.shape[:2]
    out = []
    for u, v in uvs:
        fx, fy = u * w - 0.5, v * h - 0.5
        ix, iy = int(np.floor(fx)), int(np.floor(fy))
        tx, ty = fx - ix, fy - iy
        p = lambda x, y: img[y % h, x % w]
        c = (p(ix, iy) * (1 - tx) * (1 - ty) + p(ix + 1, iy) * tx * (1 - ty)
             + p(ix, iy + 1) * (1 - tx) * ty + p(ix + 1, iy + 1) * tx * ty)
        out.append(c)
    out = np.asarray(out, np.float32)
    return out if channel is None else out[:, channel]


def _fetch(ds, mat_id, uvs, norm=UP):
    ids = jnp.full((len(uvs),), mat_id, jnp.int32)
    mat, n = dsc.get_textured_material(ds, ids, jnp.asarray(uvs, jnp.float32),
                                       norm[: len(uvs)])
    return mat, n


def test_constant_material_passthrough(textured):
    ds, _, _ = textured
    uvs = [(0.1, 0.2), (0.9, 0.7)]
    mat, n = _fetch(ds, WHITE, uvs)
    np.testing.assert_allclose(np.asarray(mat.base_color), 0.73, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mat.metallic), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mat.roughness), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), np.asarray(UP[:2]), atol=1e-6)


def test_image_base_color_matches_hand_bilinear(textured):
    ds, _, _ = textured
    # adjacent tile centers (tiles are 1/8 wide) + a tile-boundary midpoint
    # (bilinear mixes the two tiles there) + an interior point
    uvs = [(0.1875, 0.0625), (0.3125, 0.0625), (0.25, 0.0625), (0.77, 0.33)]
    mat, _ = _fetch(ds, CHECKER_FLOOR, uvs)
    expect = _pil_bilinear(os.path.join(SCENES, "textures", "checker.png"), uvs)
    np.testing.assert_allclose(np.asarray(mat.base_color), expect, atol=1e-5)
    # adjacent tiles must actually alternate dark/bright
    lum = np.asarray(mat.base_color).mean(axis=-1)
    assert abs(lum[0] - lum[1]) > 0.4


def test_procedural_base_color(textured):
    ds, _, _ = textured
    uvs = [(0.11, 0.23), (0.61, 0.47)]
    mat, _ = _fetch(ds, PROC_WALL, uvs)
    expect = np.asarray(dsc.procedural_texture(jnp.asarray(uvs, jnp.float32)))
    np.testing.assert_allclose(np.asarray(mat.base_color), expect, atol=1e-6)
    assert not np.allclose(expect[0], expect[1])


def test_metallic_and_roughness_maps(textured):
    ds, _, _ = textured
    uvs = [(0.03, 0.06), (0.502, 0.502), (0.25, 0.75), (0.9, 0.1)]
    mat, _ = _fetch(ds, MAPPED_METAL, uvs)
    exp_metal = _pil_bilinear(
        os.path.join(SCENES, "textures", "checker.png"), uvs, channel=0)
    exp_rough = _pil_bilinear(
        os.path.join(SCENES, "textures", "rough_gradient.png"), uvs, channel=0)
    np.testing.assert_allclose(np.asarray(mat.metallic), exp_metal, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mat.roughness), exp_rough, atol=1e-5)
    # gradient actually varies with u
    assert np.asarray(mat.roughness)[3] > np.asarray(mat.roughness)[2]
    # base color stays the scene constant
    np.testing.assert_allclose(
        np.asarray(mat.base_color), [[0.95, 0.73, 0.33]] * 4, atol=1e-6)


def test_normal_map_flat_and_bump(textured):
    ds, _, _ = textured
    # bump lattice has 6 cells over [0,1]; cell corners (r2 > 0.7^2) are flat
    flat_uv = (0.5 / 6, 0.5 / 6 + 0.49 / 6)  # cell edge midpoint: flat
    bump_uv = (0.5 / 6 + 0.03, 0.5 / 6)  # just off a bump apex: tilted
    mat, n = _fetch(ds, BUMPY_WALL, [flat_uv, bump_uv])
    n = np.asarray(n)
    # flat texel encodes exactly (0.5, 0.5, 1.0) -> geometric normal unchanged
    np.testing.assert_allclose(n[0], [0.0, 0.0, 1.0], atol=2e-2)
    # bumped texel: unit length, and dot(new, old) == local z component
    assert abs(np.linalg.norm(n[1]) - 1.0) < 1e-5
    mapped = _pil_bilinear(
        os.path.join(SCENES, "textures", "normal_bumps.png"), [bump_uv])[0]
    local = mapped - 0.5
    local /= np.linalg.norm(local)
    assert abs(float(n[1] @ [0.0, 0.0, 1.0]) - local[2]) < 1e-4
    assert local[2] < 0.999  # the bump really tilts


@pytest.mark.slow
def test_textured_golden_render(textured):
    """Low-spp golden render: deterministic Sobol sampling on CPU; guards the
    whole texture pipeline (loader -> atlas -> bilinear -> shading)."""
    from radish_pt_tpu.config import Settings, Tracer
    from radish_pt_tpu.render.renderer import Renderer

    ds, cam, desc = textured
    cam = cam.replace(width=32, height=32)
    s = Settings(tracer=Tracer.STREAMED, trace_depth=3)
    r = Renderer(ds=ds, cam=cam, desc=desc, settings=s)
    img = r.render(spp=2)
    assert np.isfinite(img).all()
    path = os.path.join(GOLDEN, "textured_32.npy")
    if not os.path.exists(path):  # first run records the golden
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden recorded")
    golden = np.load(path)
    assert np.abs(img - golden).mean() < 2e-2

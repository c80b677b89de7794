"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4c: pjit/shard_map sharding tests standing in for multi-chip)."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radish_pt_tpu.parallel import sharding as sh
from radish_pt_tpu.render import pathtrace as pt

pytestmark = pytest.mark.slow  # sharded renders: minutes on the 1-core host


@pytest.fixture(scope="module")
def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs --xla_force_host_platform_device_count=8")
    return devs


def test_make_mesh_shapes(cpu8):
    mesh = sh.make_mesh(n_tile=4, n_sample=2, devices=cpu8)
    assert mesh.shape == {"tile": 4, "sample": 2}
    mesh2 = sh.make_mesh(devices=cpu8)
    assert mesh2.shape["tile"] == 8


def _assert_frames_match(got, want, atol=1e-4, max_flips=2):
    """Sharded-vs-single frame comparison robust to DISCRETE estimator
    flips: the two sides are different XLA programs, and constant folding
    or fusion differences can move a grazing shadow ray by an ulp —
    flipping one binary visibility decision and losing/gaining that
    pixel's whole 1-spp NEE contribution (measured: one cornell pixel's
    bounce-1 NEE flips with a literal vs traced frame counter, everything
    else bitwise-close to 6e-8).  Real sharding bugs (misrouted lanes,
    seam errors, wrong collectives) move whole regions, not <=``max_flips``
    isolated pixels, so this stays a sharp test."""
    diff = np.abs(got - want).max(axis=-1)
    flipped = diff > atol
    assert flipped.sum() <= max_flips, (
        f"{flipped.sum()} pixels differ (> {max_flips} allowed): "
        f"idx {np.where(flipped)[0][:10]}, max {diff.max()}"
    )
    # a flipped pixel contributes its whole radiance to the mean at the
    # tiny test resolutions (0.003 / 256 px ~ 1e-5); bound the mean loosely
    # enough for max_flips such pixels, tightly enough to catch region bugs
    assert diff.mean() < 5e-5, f"mean abs diff {diff.mean()}"


def test_tile_sharded_render_matches_single_device(cornell, cpu8):
    """8-way tile-sharded frame == single-device frame (bitwise-close):
    tile parallelism must not change the estimator."""
    ds, cam, _ = cornell
    mesh = sh.make_mesh(n_tile=8, n_sample=1, devices=cpu8)
    ds_r = sh.replicate_scene(mesh, ds)

    frame = jax.jit(partial(sh.render_frame_sharded, mesh, max_depth=2))
    out_sharded = np.asarray(frame(ds_r, cam, 5))

    with jax.default_device(cpu8[0]):
        d, ind = jax.jit(pt.path_trace, static_argnames=("max_depth",))(
            ds, cam, 5, 2
        )
        out_single = np.asarray(d + ind)

    _assert_frames_match(out_sharded, out_single)


def test_sample_axis_averages(cornell, cpu8):
    """(tile=2, sample=2): pmean over the sample axis equals the average of
    the two decorrelated single-device frames."""
    ds, cam, _ = cornell
    mesh = sh.make_mesh(n_tile=2, n_sample=2, devices=cpu8[:4])
    ds_r = sh.replicate_scene(mesh, ds)
    looper = 3
    frame = jax.jit(partial(sh.render_frame_sharded, mesh, max_depth=2))
    out = np.asarray(frame(ds_r, cam, looper))

    with jax.default_device(cpu8[0]):
        f = jax.jit(pt.path_trace, static_argnames=("max_depth",))
        imgs = []
        for offset in (0, 37):  # the sample-axis looper decorrelation
            d, ind = f(ds, cam, looper + offset, 2)
            imgs.append(np.asarray(d + ind))
    _assert_frames_match(out, np.mean(imgs, axis=0))


def test_accumulate_sharded_runs(cornell, cpu8):
    ds, cam, _ = cornell
    mesh = sh.make_mesh(n_tile=8, n_sample=1, devices=cpu8)
    ds_r = sh.replicate_scene(mesh, ds)
    n_pad = sh._padded_pixel_count(cam, 8)
    accum = sh.shard_image(mesh, jnp.zeros((cam.width * cam.height, 3)), cam)
    out = jax.jit(partial(sh.render_accumulate_sharded, mesh, max_depth=2))(
        ds_r, cam, accum, 0, 0)
    out = np.asarray(out)
    assert np.isfinite(out).all() and out.mean() > 0.01


def test_restir_step_sharded_matches_single_device(cornell, cpu8):
    """Sharded ReSTIR frame == single-device frame away from tile seams.

    Seam semantics (sharding.py::restir_step_sharded): spatial reuse
    candidates whose pixel lives in another shard are rejected (seam ==
    image border), so only rows within the 5-pixel disk radius of a seam
    may differ; interior rows must match bitwise-close.  Static camera, so
    temporal gathers (identity motion) never cross seams."""
    from radish_pt_tpu.config import ReservoirReuse
    from radish_pt_tpu.render import gbuffer as gb
    from radish_pt_tpu.render import restir as rs

    ds, cam, _ = cornell
    n_tile = 2
    cam = cam.replace(width=16, height=32)  # 2 shards x 16 rows
    n = cam.width * cam.height
    mesh = sh.make_mesh(n_tile=n_tile, n_sample=1, devices=cpu8[:n_tile])
    ds_r = sh.replicate_scene(mesh, ds)

    res0 = rs.empty_reservoir(n)
    gbuf_last0 = gb.empty_frame(n)
    direct0 = jnp.zeros((n, 3), jnp.float32)

    # two frames so the temporal chain is exercised.  The step MUST be
    # jitted: an eager shard_map dispatches the whole graph op-by-op
    # (measured ~112 s per 512-pixel step on this host vs seconds jitted)
    step = jax.jit(partial(sh.restir_step_sharded, mesh,
                           reuse=ReservoirReuse.TEMPORAL_SPATIAL))
    d_sh, r_sh, g_sh = step(
        ds_r, cam, cam, 0, gbuf_last0, res0, jnp.asarray(True), direct0, 0)
    d_sh, r_sh, g_sh = step(
        ds_r, cam, cam, 1, g_sh.frame, r_sh, jnp.asarray(False), d_sh, 1)
    d_sh = np.asarray(d_sh)[:n]

    with jax.default_device(cpu8[0]):
        gfn = jax.jit(gb.render_gbuffer)
        state = (res0, gbuf_last0, direct0, True)
        for i in range(2):
            res, last_f, direct, first = state
            gbuf = gfn(ds, cam, cam)
            d, res = rs.restir_direct(
                ds, cam, i, gbuf, last_f, res, jnp.asarray(first),
                ReservoirReuse.TEMPORAL_SPATIAL, 32, 20,
            )
            direct = pt.accumulate(direct, pt.scrub_and_compress(d), i)
            state = (res, gbuf.frame, direct, False)
        d_ref = np.asarray(state[2])

    img_sh = d_sh.reshape(cam.height, cam.width, 3)
    img_ref = d_ref.reshape(cam.height, cam.width, 3)
    seam = cam.height // n_tile  # first row of shard 1
    interior = np.r_[0:seam - 5, seam + 5:cam.height]
    np.testing.assert_allclose(
        img_sh[interior], img_ref[interior], rtol=1e-5, atol=1e-6
    )
    # seam rows may differ (rejected cross-seam candidates) but must stay
    # finite and non-negative
    assert np.isfinite(img_sh).all() and (img_sh >= 0).all()


def test_sharded_svgf_matches_single_device(cornell, cpu8):
    """Denoisers run on the mesh through plain jit + GSPMD auto-partitioning
    (halo exchanges inserted by XLA) — output must equal the single-device
    filter exactly, unlike the border-rule ReSTIR seams."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radish_pt_tpu.render import denoise as dn
    from radish_pt_tpu.render import gbuffer as gb

    ds, cam, _ = cornell
    cam = cam.replace(width=16, height=32)
    n = cam.width * cam.height
    mesh = sh.make_mesh(n_tile=8, n_sample=1, devices=cpu8)

    rng = np.random.default_rng(3)
    color = jnp.asarray(rng.uniform(0, 2, (n, 3)).astype(np.float32))
    gbuf = jax.jit(gb.render_gbuffer)(ds, cam, cam)
    state = dn.empty_svgf_state(n)

    fn = jax.jit(dn.svgf_filter, static_argnames=("levels",))
    out_ref, st_ref = fn(color, state, gbuf, gbuf.frame, cam,
                         jnp.asarray(False), levels=5)

    shard = NamedSharding(mesh, P("tile"))
    put = lambda x: jax.device_put(x, shard)
    color_s = put(color)
    gbuf_s = jax.tree_util.tree_map(put, gbuf)
    state_s = jax.tree_util.tree_map(put, state)
    out_s, st_s = fn(color_s, state_s, gbuf_s, gbuf_s.frame, cam,
                     jnp.asarray(False), levels=5)

    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_ref), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(st_s.accum_color), np.asarray(st_ref.accum_color),
        rtol=1e-6, atol=1e-7,
    )


def test_restir_sharded_odd_height_runs(cornell, cpu8):
    """Shards that aren't whole image rows (height % n_tile != 0) must fall
    back to the gather-based spatial reuse instead of crashing on the
    rolled-image reshape."""
    from radish_pt_tpu.config import ReservoirReuse
    from radish_pt_tpu.render import gbuffer as gb
    from radish_pt_tpu.render import restir as rs

    ds, cam, _ = cornell
    cam = cam.replace(width=16, height=30)  # 480 px / 4 tiles = 120, %16 != 0
    mesh = sh.make_mesh(n_tile=4, n_sample=1, devices=cpu8[:4])
    n_pad = sh._padded_pixel_count(cam, 4)
    res0 = rs.empty_reservoir(n_pad)
    gbuf_last0 = gb.empty_frame(n_pad)
    direct0 = jnp.zeros((n_pad, 3), jnp.float32)
    ds_r = sh.replicate_scene(mesh, ds)
    step = jax.jit(partial(sh.restir_step_sharded, mesh,
                           reuse=ReservoirReuse.TEMPORAL_SPATIAL))
    d, r, g = step(
        ds_r, cam, cam, 0, gbuf_last0, res0, jnp.asarray(True), direct0, 0)
    out = np.asarray(d)[: cam.width * cam.height]
    assert np.isfinite(out).all() and (out >= 0).all()

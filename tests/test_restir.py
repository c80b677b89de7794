"""ReSTIR reservoir math + end-to-end direct-light agreement
(restir.h/restir.cu semantics, with the corrected WRS rule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radish_pt_tpu.config import ReservoirReuse
from radish_pt_tpu.render import gbuffer as gb
from radish_pt_tpu.render import pathtrace as pt
from radish_pt_tpu.render import restir as rs


def _res(n=4):
    return rs.empty_reservoir(n)


def test_update_accumulates_weight_and_count():
    r = _res(3)
    li = jnp.ones((3, 3))
    wi = jnp.zeros((3, 3))
    d = jnp.ones((3,))
    r = rs._update(r, li, wi, d, jnp.array([1.0, 2.0, 0.0]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(r.weight), [1, 2, 0])
    np.testing.assert_allclose(np.asarray(r.num), 1.0)
    # rand=0 -> always take (rand*W < w) except when w == 0
    np.testing.assert_allclose(np.asarray(r.li)[0], 1.0)


def test_update_wrs_distribution():
    """Candidates with weights [1, 3] must be kept with probs [0.25, 0.75]."""
    n = 8192
    rng = np.random.default_rng(0)
    r = _res(n)
    li1 = jnp.broadcast_to(jnp.array([1.0, 0, 0]), (n, 3))
    li2 = jnp.broadcast_to(jnp.array([0, 1.0, 0]), (n, 3))
    z3 = jnp.zeros((n, 3))
    z = jnp.zeros((n,))
    r = rs._update(r, li1, z3, z, jnp.full((n,), 1.0), jnp.asarray(rng.random(n), jnp.float32))
    r = rs._update(r, li2, z3, z, jnp.full((n,), 3.0), jnp.asarray(rng.random(n), jnp.float32))
    frac2 = float(np.asarray(r.li)[:, 1].mean())
    assert frac2 == pytest.approx(0.75, abs=0.02)
    np.testing.assert_allclose(np.asarray(r.weight), 4.0)
    np.testing.assert_allclose(np.asarray(r.num), 2.0)


def test_merge_distribution():
    n = 8192
    rng = np.random.default_rng(1)
    a = _res(n).replace(
        weight=jnp.full((n,), 2.0),
        num=jnp.full((n,), 5.0),
        li=jnp.broadcast_to(jnp.array([1.0, 0, 0]), (n, 3)),
    )
    b = _res(n).replace(
        weight=jnp.full((n,), 6.0),
        num=jnp.full((n,), 5.0),
        li=jnp.broadcast_to(jnp.array([0, 1.0, 0]), (n, 3)),
    )
    out = rs._merge(a, b, jnp.asarray(rng.random(n), jnp.float32), jnp.ones((n,), bool))
    np.testing.assert_allclose(np.asarray(out.weight), 8.0)
    np.testing.assert_allclose(np.asarray(out.num), 10.0)
    frac_b = float(np.asarray(out.li)[:, 1].mean())
    assert frac_b == pytest.approx(6 / 8, abs=0.02)


def test_pre_clamped_merge_limits_history():
    """rhs history clamped to (M-1) x ours (restir.h:70-78, M=20)."""
    n = 4
    a = _res(n).replace(weight=jnp.ones((n,)), num=jnp.ones((n,)))
    b = _res(n).replace(weight=jnp.full((n,), 500.0), num=jnp.full((n,), 100.0))
    out = rs._pre_clamped_merge(a, b, jnp.zeros(n), jnp.ones(n, bool), 20)
    # rhs scaled to 19 samples (19/100 of weight) then merged
    np.testing.assert_allclose(np.asarray(out.num), 20.0)
    np.testing.assert_allclose(np.asarray(out.weight), 1.0 + 500.0 * 19 / 100, rtol=1e-5)


def test_check_validity_resets_nan():
    n = 3
    r = _res(n).replace(weight=jnp.array([1.0, jnp.nan, -2.0]), num=jnp.full((n,), 4.0))
    out = rs._check_validity(r)
    np.testing.assert_allclose(np.asarray(out.weight), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.num), [4.0, 0.0, 0.0])


def test_temporal_neighbor_validation(cornell):
    """Temporal gather rejects lanes whose id/normal changed."""
    ds, cam, _ = cornell
    n = 4
    res = _res(n).replace(weight=jnp.arange(1.0, 5.0), num=jnp.ones((n,)))
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    cur = gb.GBufferFrame(
        normal=normal,
        prim_id=jnp.array([1, 1, 1, 1], jnp.int32),
        depth=jnp.ones((n,)),
    )
    last = gb.GBufferFrame(
        normal=jnp.stack([normal[0], normal[1], -normal[2], normal[3]]),
        prim_id=jnp.array([1, 2, 1, 1], jnp.int32),
        depth=jnp.ones((n,)),
    )
    motion = jnp.array([0, 1, 2, -1], jnp.int32)
    out = rs.find_temporal_neighbor(res, motion, cur, last)
    w = np.asarray(out.weight)
    assert w[0] == 1.0  # valid
    assert w[1] == 0.0  # prim mismatch
    # lane 2: |dot(n, -n)| = 1 >= 0.1 -> VALID (abs like the reference)
    assert w[2] == 3.0
    assert w[3] == 0.0  # no motion


def test_restir_matches_pt_direct_mean(cornell):
    """ReSTIR RIS-only (no reuse) estimates the same direct lighting as the
    plain direct tracer, modulo noise — compare image means over frames.

    The camera is aimed at the flat back wall so every (jittered) primary ray
    hits the same surface: at object edges the demodulate/re-modulate scheme
    pairs a jittered shading ray with the pinhole G-buffer albedo — the same
    approximation the reference makes (restir.cu:125,200) — which would skew
    a whole-box comparison at 16x16.
    """
    ds, cam, _ = cornell
    from radish_pt_tpu.scene.camera import make_camera

    cam = make_camera(
        cam.width, cam.height, (0.0, 5.0, 3.0), (-90.0, 0.0, 0.0), fov_y=15.0
    )

    gfn = jax.jit(gb.render_gbuffer)
    rfn = jax.jit(
        lambda ds, cam, looper, gbuf, first: rs.restir_direct(
            ds, cam, looper, gbuf, gbuf.frame, rs.empty_reservoir(cam.width * cam.height),
            first, ReservoirReuse.NONE, 8, 20,
        )[0]
    )
    dfn = jax.jit(pt.path_trace_direct)

    means_r, means_d = [], []
    gbuf = gfn(ds, cam, cam)
    for i in range(6):
        means_r.append(float(rfn(ds, cam, i, gbuf, jnp.asarray(True)).mean()))
        means_d.append(float(dfn(ds, cam, i).mean()))
    mr, md = np.mean(means_r), np.mean(means_d)
    assert mr == pytest.approx(md, rel=0.15), (mr, md)
    assert mr > 0.01


def test_batched_restir_matches_step_sequence(cornell):
    """render_batched on the ReSTIR tracer must reproduce the unbatched
    step() sequence exactly: same loopers, carried reservoir, G-buffer
    rendered once per static-camera batch (VERDICT r1 weak #7)."""
    from radish_pt_tpu.config import Settings, Tracer, Denoiser
    from radish_pt_tpu.render.renderer import Renderer

    ds, cam, desc = cornell
    spp = 4

    def make():
        # desc=None: desc.state is a MUTABLE RenderState that would be shared
        # (and advanced) across both renderers
        return Renderer(
            ds=ds, cam=cam, desc=None,
            settings=Settings(
                tracer=Tracer.RESTIR_DI, denoiser=Denoiser.NONE,
                reservoir_size=4,
            ),
        )

    a = make()
    for _ in range(spp):
        a.step()

    b = make()
    b.render_batched(spp, block=2)

    np.testing.assert_allclose(
        np.asarray(a.direct), np.asarray(b.direct), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.reservoir.weight), np.asarray(b.reservoir.weight),
        rtol=1e-5, atol=1e-6,
    )
    assert a.state.iteration == b.state.iteration == spp

    # camera move at the batch boundary: frame 0 of the next batch must
    # reproject through the OLD camera, frames k>0 through the new one
    new_pos = np.asarray(a.cam.position) + np.array([0.05, 0.0, 0.0])
    a.update_camera(position=new_pos)
    b.update_camera(position=new_pos)
    for _ in range(2):
        a.step()
    b.render_batched(2, block=2)
    np.testing.assert_allclose(
        np.asarray(a.direct), np.asarray(b.direct), rtol=1e-5, atol=1e-6
    )

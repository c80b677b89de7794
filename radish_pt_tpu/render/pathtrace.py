"""Wavefront path tracer with MIS next-event estimation.

TPU re-design of the reference megakernels
(``singleKernelPT`` /root/reference/src/pathtrace.cu:149-291 and
``PTDirectKernel`` pathtrace.cu:293-345).  The per-thread bounce loop becomes
a lockstep masked wavefront over all pixels: every bounce runs ray-gen /
intersect / NEE / BSDF-sample stages on [N]-shaped SoA state, with dead lanes
masked out.  On TPU this is the idiomatic shape — the VPU has no divergence
penalty, and the two BVH walks per bounce (closest-hit + shadow) are lockstep
``while_loop``s over dense HBM arrays.

Deviations from the reference (documented, intentional):
* Primary-ray miss shades from the env map (or black), not the debug
  ``vec3(1)`` placeholder at pathtrace.cu:169-171.
* Primary-visible lights shade their radiance like ``PTDirectKernel``
  (pathtrace.cu:318-321), not ``vec3(1)``.
* Light/env pdfs use the consistent power-proportional formulas (see
  scene/device_scene.py docstring).
* Depth-of-field aperture sampling is wired in (the reference fixes
  pAperture = 0; sceneStructs.h:81).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..bsdf import materials as bsdf
from ..scene import camera as cam_mod
from ..scene import device_scene as dsc
from ..sampling import rng
from ..utils import math as m

NULL_PRIMITIVE = -1


def _pixel_grid(cam: cam_mod.Camera, pixel_idx=None):
    """Pixel lane indices; pass an explicit shard of flat indices to render a
    subset of the image (multi-chip tile parallelism, parallel/sharding.py)."""
    if pixel_idx is None:
        pixel_idx = jnp.arange(cam.width * cam.height, dtype=jnp.int32)
    x = pixel_idx % cam.width
    y = pixel_idx // cam.width
    return pixel_idx, x, y


TILE_W, TILE_H = 16, 8  # 128 lanes = one 8x16 pixel tile


@functools.lru_cache(maxsize=8)
def _tile_perm(w: int, h: int):
    """Static tile-order lane permutation: 128 consecutive lanes cover an
    8x16 PIXEL TILE instead of a 128-pixel scanline strip.  The Pallas
    engines cull triangle clusters per 128/256-lane row, so the row union
    tracks the rays' spatial footprint: a tile's frustum is ~10x narrower
    than a scanline's (measured on teapot_hires primaries: 108 -> 80
    ms/sweep).  Row-major tile order keeps the INVERSE a pure
    reshape/transpose (:func:`_untile`) — no gather on the hot path; the
    forward perm is only index arithmetic feeding ray generation."""
    perm = (
        np.arange(w * h, dtype=np.int32)
        .reshape(h // TILE_H, TILE_H, w // TILE_W, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    return perm


def _untile(x, w: int, h: int):
    """[N, ...] tile-order lanes -> pixel (raster) order, as a transpose."""
    tail = x.shape[1:]
    x = x.reshape(h // TILE_H, w // TILE_W, TILE_H, TILE_W, *tail)
    return x.transpose(0, 2, 1, 3, *range(4, 4 + len(tail))).reshape(
        w * h, *tail
    )


def _tiled_lanes(ds, cam, pixel_idx):
    """Tile-order permutation for full-frame waves on the Pallas engines
    (explicit pixel_idx shards — multi-chip — keep their own order).
    Returns (perm constant | None, untile fn | None)."""
    if (
        pixel_idx is not None
        or ds.intersector not in dsc.MXU_ENGINES
        or cam.width % TILE_W
        or cam.height % TILE_H
    ):
        return None, None
    perm = jnp.asarray(_tile_perm(cam.width, cam.height))
    return perm, lambda x: _untile(x, cam.width, cam.height)


def sample_aperture(ds: dsc.DeviceScene, r2):
    """Sample a lens point in [-1,1]^2: custom aperture mask (alias table over
    mask luminance, scene.cpp:171-188) or uniform concentric disk."""
    if not ds.has_aperture:
        return m.concentric_sample_disk(r2[..., 0], r2[..., 1])
    from ..sampling.alias import alias_sample

    pix = alias_sample(
        ds.aperture_alias_prob, ds.aperture_alias_idx, r2[..., 0], r2[..., 1]
    )
    w = ds.tex_width[ds.aperture_tex]
    h = ds.tex_height[ds.aperture_tex]
    y = pix // w
    x = pix - y * w
    u = (x.astype(jnp.float32) + 0.5) / w.astype(jnp.float32)
    v = (y.astype(jnp.float32) + 0.5) / h.astype(jnp.float32)
    return jnp.stack([u * 2.0 - 1.0, v * 2.0 - 1.0], axis=-1)


def _gen_primary(ds, cam, sampler, pixel_idx=None):
    """Primary ray generation with jitter + aperture."""
    _, x, y = _pixel_grid(cam, pixel_idx)
    r4, sampler = rng.sample_4d(ds.sobol, sampler)
    p_ap = sample_aperture(ds, r4[..., 2:4])
    ray_o, ray_d = cam_mod.sample_rays(cam, x, y, r4, p_aperture=p_ap)
    return ray_o, ray_d, sampler


def _light_visible_side(ds, norm, ray_d):
    """Single-sided emission test for a ray hitting a light: front side is
    the geometric-normal side (consistent convention; see device_scene)."""
    if not ds.single_sided:
        return jnp.ones(norm.shape[:-1], bool)
    return m.dot(norm, ray_d) < 0.0


def _compact_divs():
    """Capacity divisors for the tiered compact bounce loop, smallest
    capacity first (``RADISH_COMPACT``: comma list overrides; ``0``
    disables compaction entirely).  On CPU (tests) only two tiers compile
    by default to keep interpret-mode suites fast."""
    env = os.environ.get("RADISH_COMPACT", "")
    if env == "0":
        return None
    if env:
        return tuple(int(x) for x in env.split(","))
    # Four tiers, not five: each lax.switch branch adds ~33 s of TPU
    # compile to every frame-shaped jit (measured: 292 s at 1 tier,
    # 423 s at 5; the closure-form teapot frame compiles in ~380 s at 3
    # tiers).  (8,2,1) was measured 12 ms slower on glass (bounces 3-4
    # ran N/2 instead of N/4), so the N/4 rung stays; the N/16 rung is
    # worth <1 ms on the measured liveness curves and one less branch.
    return (8, 4, 2, 1) if jax.default_backend() == "tpu" else (4, 1)


def path_trace(
    ds: dsc.DeviceScene,
    cam: cam_mod.Camera,
    looper,
    max_depth: int,
    pixel_idx=None,
):
    """Full-MIS path trace, one sample per pixel.

    Returns (direct [N,3], indirect [N,3]) — the same split as the reference:
    ``direct`` holds primary-visible emission + first-vertex NEE, everything
    else lands in ``indirect`` (pathtrace.cu:203,244,269).
    """
    perm, untile = _tiled_lanes(ds, cam, pixel_idx)
    if perm is not None:
        pixel_idx = perm
    idx, _, _ = _pixel_grid(cam, pixel_idx)
    n = idx.shape[0]
    sampler = rng.make_sampler(looper, idx)

    ray_o, ray_d, sampler = _gen_primary(ds, cam, sampler, idx)
    # derive from ray state so the buffers inherit shard_map varying axes
    # (plain zeros would be replicated constants and fail the fori carry check)
    direct = ray_d * 0.0
    indirect = ray_d * 0.0

    it = dsc.intersect_primary(ds, ray_o, ray_d)

    hit = it.prim_id != NULL_PRIMITIVE
    direct += jnp.where(hit[..., None], 0.0, dsc.env_radiance(ds, ray_d))

    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    is_light = hit & (mat.mtype == dsc.MAT_LIGHT)
    light_vis = _light_visible_side(ds, norm, ray_d)
    direct += jnp.where(
        (is_light & light_vis)[..., None], mat.base_color, 0.0
    )

    active = hit & ~is_light
    throughput = ray_d * 0.0 + 1.0
    pos = it.pos

    divs = _compact_divs()
    if divs is not None and ds.cluster_bounds is not None and max_depth >= 1:
        direct, indirect = _compact_bounce_loop(
            ds, sampler, active, throughput, direct, indirect,
            pos, norm, ray_d, mat, max_depth,
        )
        if untile is not None:
            direct, indirect = untile(direct), untile(indirect)
        return direct, indirect

    wo = -ray_d

    def bounce(depth, carry):
        """One bounce of the reference loop (pathtrace.cu:187-272).  A
        ``fori_loop`` body instead of an unrolled chain keeps the compiled
        graph (and TPU compile time) independent of trace depth."""
        (sampler, active, throughput, direct, indirect,
         pos, norm, ray_d, mat) = carry
        wo = -ray_d

        is_delta_bsdf = mat.mtype == dsc.MAT_DIELECTRIC
        # two-sided shading for non-delta materials (pathtrace.cu:190-193)
        flip = (~is_delta_bsdf) & (m.dot(norm, wo) < 0.0)
        norm = jnp.where(flip[..., None], -norm, norm)

        # ---- NEE with MIS (pathtrace.cu:195-207) ----
        # NOTE: the shadow signature sort stays ON even for tile-ordered
        # lanes: on a full-live single pass unsorted wins by ~20% (tile
        # origins are already coherent), but the sort's dead-lane PACKING
        # is what makes late-bounce occlusion nearly free — removing it
        # cost teapot 175 -> 314 ms/frame (measured round 2)
        r4, sampler = rng.sample_4d(ds.sobol, sampler)
        li, wi, light_pdf = dsc.sample_direct_light(
            ds, pos, r4, mask=active & ~is_delta_bsdf, shade_normal=norm
        )
        nee_ok = active & (~is_delta_bsdf) & (light_pdf > 0.0)
        f = bsdf.bsdf_eval(mat, norm, wo, wi, types=ds.mat_types)
        b_pdf = bsdf.bsdf_pdf(mat, norm, wo, wi, types=ds.mat_types)
        mis_w = m.power_heuristic(light_pdf, b_pdf)
        contrib = (
            throughput
            * f
            * li
            * (m.sat_dot(norm, wi) / jnp.maximum(light_pdf, 1e-12) * mis_w)[..., None]
        )
        contrib = jnp.where(nee_ok[..., None], contrib, 0.0)
        # first-vertex NEE -> direct, the rest -> indirect (pathtrace.cu:203)
        is_first = depth == 1
        direct = direct + jnp.where(is_first, contrib, 0.0)
        indirect = indirect + jnp.where(is_first, 0.0, contrib)

        # ---- BSDF sample (pathtrace.cu:210-223) ----
        r3, sampler = rng.sample_3d(ds.sobol, sampler)
        samp = bsdf.bsdf_sample(mat, norm, wo, r3, types=ds.mat_types)
        bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
        active = active & ~bad
        delta_sample = bsdf.is_delta(samp.type)
        cos_term = jnp.where(delta_sample, 1.0, m.abs_dot(norm, samp.dir))
        throughput = throughput * samp.bsdf * (
            cos_term / jnp.maximum(samp.pdf, 1e-12)
        )[..., None]

        # ---- extend ray (pathtrace.cu:225-228); bounce rays are divergent,
        # so sort them by (octant, origin cell) to keep block culling alive
        prev_pos = pos
        ray_d = samp.dir
        ray_o = prev_pos + ray_d * 1e-5
        it = dsc.intersect_sorted(ds, ray_o, ray_d, active=active)
        pos = it.pos

        miss = active & (it.prim_id == NULL_PRIMITIVE)
        if ds.has_env:
            env_pdf = dsc.env_map_pdf(ds, ray_d)
            w_env = jnp.where(
                delta_sample, 1.0, m.power_heuristic(samp.pdf, env_pdf)
            )
            indirect = indirect + jnp.where(
                miss[..., None],
                dsc.env_radiance(ds, ray_d) * throughput * w_env[..., None],
                0.0,
            )
        active = active & ~miss

        mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
        hit_light = active & (mat.mtype == dsc.MAT_LIGHT)
        light_vis = _light_visible_side(ds, norm, ray_d)
        light_pdf_hit = dsc.area_light_hit_pdf(
            ds, mat.base_color, prev_pos, pos, norm
        )
        w_light = jnp.where(
            delta_sample, 1.0, m.power_heuristic(samp.pdf, light_pdf_hit)
        )
        indirect = indirect + jnp.where(
            (hit_light & light_vis)[..., None],
            mat.base_color * throughput * w_light[..., None],
            0.0,
        )
        active = active & ~hit_light
        return (sampler, active, throughput, direct, indirect,
                pos, norm, ray_d, mat)

    carry = (sampler, active, throughput, direct, indirect,
             pos, norm, ray_d, mat)
    carry = jax.lax.fori_loop(1, max_depth + 1, bounce, carry)
    direct, indirect = carry[3], carry[4]
    if untile is not None:  # back to pixel order (pure transpose)
        direct, indirect = untile(direct), untile(indirect)
    return direct, indirect


def _nee_contrib(ds, sampler, active, mat, norm, wo, pos, throughput):
    """Next-event estimation with MIS at the current vertex; returns
    (contrib [K,3] — zero on masked lanes, sampler)."""
    is_delta = mat.mtype == dsc.MAT_DIELECTRIC
    r4, sampler = rng.sample_4d(ds.sobol, sampler)
    li, wi, light_pdf = dsc.sample_direct_light(
        ds, pos, r4, mask=active & ~is_delta, shade_normal=norm
    )
    nee_ok = active & (~is_delta) & (light_pdf > 0.0)
    f = bsdf.bsdf_eval(mat, norm, wo, wi, types=ds.mat_types)
    b_pdf = bsdf.bsdf_pdf(mat, norm, wo, wi, types=ds.mat_types)
    mis_w = m.power_heuristic(light_pdf, b_pdf)
    contrib = (
        throughput * f * li
        * (m.sat_dot(norm, wi) / jnp.maximum(light_pdf, 1e-12) * mis_w)[
            ..., None]
    )
    return jnp.where(nee_ok[..., None], contrib, 0.0), sampler


def _bsdf_advance(ds, sampler, active, mat, norm, wo, throughput):
    """BSDF importance sample + throughput update; returns
    (sampler, active, throughput, new_dir, pdf, delta_sample)."""
    r3, sampler = rng.sample_3d(ds.sobol, sampler)
    samp = bsdf.bsdf_sample(mat, norm, wo, r3, types=ds.mat_types)
    bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
    active = active & ~bad
    delta_sample = bsdf.is_delta(samp.type)
    cos_term = jnp.where(delta_sample, 1.0, m.abs_dot(norm, samp.dir))
    throughput = throughput * samp.bsdf * (
        cos_term / jnp.maximum(samp.pdf, 1e-12)
    )[..., None]
    return sampler, active, throughput, samp.dir, samp.pdf, delta_sample


def _ext_and_fetch(ds, pos, new_dir, pdf, delta_sample, active,
                   throughput, scramble, lane, acc):
    """Extension segment of one bounce in COMPACT space: signature-sort the
    rays (dead lanes to the back — the compaction), sweep, recover the hit
    surface, and account env-miss / emissive-hit MIS into the per-lane
    accumulator.  Everything returns in the new sorted order; there is no
    inverse permutation (the caller's whole carry lives in this order).

    ``acc`` None means "all zero" (the peeled first bounce) — the columns
    then skip the forward sort entirely.

    Returns the next-bounce carry slice:
    ``(lane, scramble, active, throughput, acc, pos, norm, dir, mat)``.
    """
    ray_o = pos + new_dir * 1e-5
    # NOTE (measured dead end): pre-shading "sure miss" rays whose
    # signature flags no cluster catches 0.0% of real misses — every
    # bounce ray starts inside its origin cluster's AABB, so the slab
    # test always flags at least one cluster.
    # lane ids are non-negative: pack the delta-BSDF flag in bit 0 so the
    # flag rides the sort without its own payload column
    lane_pk = (lane << 1) | delta_sample.astype(jnp.int32)
    extras = (lane_pk, scramble,
              throughput[:, 0], throughput[:, 1], throughput[:, 2], pdf)
    if acc is not None:
        extras = extras + (acc[:, 0], acc[:, 1], acc[:, 2])
    it, o_s, d_s, act_s, ex = dsc.intersect_compact(
        ds, ray_o, new_dir, active, extras
    )
    lane_pk_s, scr_s = ex[0], ex[1]
    thr_s = jnp.stack(ex[2:5], axis=-1)
    pdf_s = ex[5]
    acc_s = jnp.stack(ex[6:9], axis=-1) if acc is not None else d_s * 0.0
    delta_s = (lane_pk_s & 1) != 0
    lane_s = lane_pk_s >> 1

    miss = act_s & (it.prim_id == NULL_PRIMITIVE)
    if ds.has_env:
        env_pdf = dsc.env_map_pdf(ds, d_s)
        w_env = jnp.where(delta_s, 1.0, m.power_heuristic(pdf_s, env_pdf))
        acc_s = acc_s + jnp.where(
            miss[..., None],
            dsc.env_radiance(ds, d_s) * thr_s * w_env[..., None],
            0.0,
        )
    act_s = act_s & ~miss

    mat_new, norm_new = dsc.get_textured_material(ds, it.mat_id, it.uv,
                                                  it.norm)
    hit_light = act_s & (mat_new.mtype == dsc.MAT_LIGHT)
    light_vis = _light_visible_side(ds, norm_new, d_s)
    # prev_pos for the area->solid-angle pdf: undo the origin inset instead
    # of sorting 3 more payload columns (the ~1e-12 residual is far below
    # the pdf's own conditioning)
    lp_hit = dsc.area_light_hit_pdf(
        ds, mat_new.base_color, o_s - d_s * 1e-5, it.pos, norm_new
    )
    w_light = jnp.where(delta_s, 1.0, m.power_heuristic(pdf_s, lp_hit))
    acc_s = acc_s + jnp.where(
        (hit_light & light_vis)[..., None],
        mat_new.base_color * thr_s * w_light[..., None],
        0.0,
    )
    act_s = act_s & ~hit_light
    return (lane_s, scr_s, act_s, thr_s, acc_s, it.pos, norm_new, d_s,
            mat_new)


def _compact_bounce_loop(ds, sampler, active, throughput, direct, indirect,
                         pos, norm, ray_d, mat, max_depth):
    """Bounces with WAVEFRONT COMPACTION: the extension pass's signature
    sort (which already packs dead lanes to the back) doubles as a stream
    compactor, and each subsequent bounce processes only a static
    live-prefix capacity chosen at runtime from ``_compact_divs()`` tiers
    via ``lax.switch``.

    Measured motivation (800^2 depth-5 wavefronts, this repo's scenes):
    liveness entering bounces 2..5 is 36%/16%/8%/4% on teapot(+hires),
    21%/13%/3%/1% on glass — but sorts, cull prepasses, surface gathers and
    shading all previously paid full-wavefront cost every bounce.  The
    carry rides in sorted order (no inverse permutes at all); per-lane
    radiance accumulates in a compact ``acc`` column and is delivered to
    the pixel-order image by ONE final inverse sort, exploiting that the
    carried lane column is always a permutation of 0..N-1 (tier slicing
    only freezes the dead tail, it never drops or duplicates a lane).

    Invariants:
    * live lanes always occupy ``[0:valid]`` of the carry, where ``valid``
      is the live count at the previous extension sort;
    * ``valid`` (and so the tier) is non-increasing across bounces;
    * RNG parity with the dense loop is exact for every live lane — the
      shared scalar ``ptr`` advances in lockstep in every tier branch and
      each lane's scramble chain rides the sorts.
    """
    n = pos.shape[0]
    ks = sorted({min(n, -(-n // d)) for d in _compact_divs()})
    if ks[-1] != n:
        ks.append(n)

    # ---- peel bounce 1 (full wavefront; its NEE lands in `direct`) ----
    wo = -ray_d
    is_delta = mat.mtype == dsc.MAT_DIELECTRIC
    flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
    norm = jnp.where(flip[..., None], -norm, norm)
    contrib, sampler = _nee_contrib(ds, sampler, active, mat, norm, wo,
                                    pos, throughput)
    direct = direct + contrib
    sampler, active, throughput, new_dir, pdf, delta_sample = _bsdf_advance(
        ds, sampler, active, mat, norm, wo, throughput
    )
    lane = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.sum(active).astype(jnp.int32)
    (lane, scr, active, throughput, acc, pos, norm, ray_d, mat) = (
        _ext_and_fetch(ds, pos, new_dir, pdf, delta_sample, active,
                       throughput, sampler.scramble, lane, acc=None)
    )

    # ---- bounces 2..max_depth at tiered capacity ----
    def make_branch(k):
        def branch(carry):
            (ptr, scr, lane, active, thr, acc, pos, norm, rd, mat,
             valid) = carry
            sl = lambda a: a[:k]  # noqa: E731
            scr_, lane_, act_, thr_, acc_, pos_, norm_, rd_ = map(
                sl, (scr, lane, active, thr, acc, pos, norm, rd)
            )
            mat_ = jax.tree_util.tree_map(sl, mat)
            smp = rng.SamplerState(scramble=scr_, ptr=ptr)
            wo = -rd_
            is_delta = mat_.mtype == dsc.MAT_DIELECTRIC
            flip = (~is_delta) & (m.dot(norm_, wo) < 0.0)
            norm_ = jnp.where(flip[..., None], -norm_, norm_)
            contrib, smp = _nee_contrib(ds, smp, act_, mat_, norm_, wo,
                                        pos_, thr_)
            acc_ = acc_ + contrib
            smp, act_, thr_, new_dir, pdf, delta_sample = _bsdf_advance(
                ds, smp, act_, mat_, norm_, wo, thr_
            )
            new_valid = jnp.sum(act_).astype(jnp.int32)
            (lane_, scr_, act_, thr_, acc_, pos_, norm_, rd_, mat_) = (
                _ext_and_fetch(ds, pos_, new_dir, pdf, delta_sample, act_,
                               thr_, smp.scramble, lane_, acc_)
            )
            wr = lambda full, part: full.at[:k].set(part)  # noqa: E731
            return (
                smp.ptr,
                wr(scr, scr_), wr(lane, lane_), wr(active, act_),
                wr(thr, thr_), wr(acc, acc_), wr(pos, pos_),
                wr(norm, norm_), wr(rd, rd_),
                jax.tree_util.tree_map(wr, mat, mat_),
                new_valid,
            )
        return branch

    branches = [make_branch(k) for k in ks]
    k_bounds = jnp.asarray(ks[:-1], jnp.int32)

    def body(_d, carry):
        tier = jnp.sum(k_bounds < carry[-1]).astype(jnp.int32)
        return jax.lax.switch(tier, branches, carry)

    carry = (sampler.ptr, scr, lane, active, throughput, acc, pos, norm,
             ray_d, mat, valid)
    carry = jax.lax.fori_loop(2, max_depth + 1, body, carry)
    lane, acc = carry[2], carry[5]

    # ---- deliver the compact accumulators to pixel order: the lane column
    # is a permutation of 0..n-1, so one 4-column sort is the exact inverse
    u = jax.lax.sort((lane, acc[:, 0], acc[:, 1], acc[:, 2]), num_keys=1)
    indirect = indirect + jnp.stack(u[1:4], axis=-1)
    return direct, indirect


def path_trace_direct(
    ds: dsc.DeviceScene, cam: cam_mod.Camera, looper, pixel_idx=None
):
    """One-bounce direct lighting — ``PTDirectKernel`` (pathtrace.cu:293-345).
    Returns direct [N, 3]."""
    perm, untile = _tiled_lanes(ds, cam, pixel_idx)
    if perm is not None:
        pixel_idx = perm
    idx, _, _ = _pixel_grid(cam, pixel_idx)
    n = idx.shape[0]
    sampler = rng.make_sampler(looper, idx)

    ray_o, ray_d, sampler = _gen_primary(ds, cam, sampler, idx)
    it = dsc.intersect_primary(ds, ray_o, ray_d)
    hit = it.prim_id != NULL_PRIMITIVE

    direct = jnp.where(hit[..., None], 0.0, dsc.env_radiance(ds, ray_d))

    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    is_light = hit & (mat.mtype == dsc.MAT_LIGHT)
    light_vis = _light_visible_side(ds, norm, ray_d)
    direct += jnp.where((is_light & light_vis)[..., None], mat.base_color, 0.0)

    wo = -ray_d
    is_delta_bsdf = mat.mtype == dsc.MAT_DIELECTRIC
    flip = (~is_delta_bsdf) & (m.dot(norm, wo) < 0.0)
    norm = jnp.where(flip[..., None], -norm, norm)

    shade = hit & ~is_light & ~is_delta_bsdf
    r4, sampler = rng.sample_4d(ds.sobol, sampler)
    li, wi, light_pdf = dsc.sample_direct_light(ds, it.pos, r4, mask=shade,
                                                shade_normal=norm)
    ok = shade & (light_pdf > 0.0)
    f = bsdf.bsdf_eval(mat, norm, wo, wi, types=ds.mat_types)
    contrib = f * li * (m.sat_dot(norm, wi) / jnp.maximum(light_pdf, 1e-12))[..., None]
    direct += jnp.where(ok[..., None], contrib, 0.0)
    if untile is not None:
        direct = untile(direct)
    return direct


def scrub_and_compress(img):
    """NaN/Inf guard + HDR->LDR range compression before accumulation
    (pathtrace.cu:279-286)."""
    bad = jnp.any(~jnp.isfinite(img), axis=-1, keepdims=True)
    img = jnp.where(bad, 0.0, img)
    return m.hdr_to_ldr(img)


def accumulate(prev, new, iteration):
    """Running mean: (prev * iter + new) / (iter + 1) (pathtrace.cu:287-290)."""
    it = jnp.asarray(iteration, jnp.float32)
    return (prev * it + new) / (it + 1.0)

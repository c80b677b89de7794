"""Pallas TPU kernels for the dense intersection path.

The brute-force ray x triangle sweep is the renderer's most regular hot loop
(small/mid scenes use it outright; it is also the ``naiveIntersect`` oracle
of SURVEY.md §7 step 2).  Layout is everything here:

* rays live on the LANE axis (128 per block),
* triangles stream through the SUBLANE axis 8 at a time,

so every (8, 128) VPU op evaluates 8 triangles x 128 rays = 1024 ray-tri
pairs with pure vector loads (no scalar broadcasts).  The per-ray closest
hit is reduced across sublanes with one argmin per 8-triangle group and
carried across triangle chunks in the output blocks (initialized on the
first chunk via ``pl.when``; the tri grid axis revisits the same output
block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NULL_PRIMITIVE = -1
FLT_MAX = 3.402823466e38

RAY_BLOCK = 1024  # rays per grid step: an (8, 128) block, row = 128 rays
TRI_CHUNK = 512  # triangles per grid step ([512, 9] VMEM block)
BIG_SCENE_TRIS = 16384  # above this, the scan grid doubles its chunk
TRI_SUB = 8  # triangles per (8, 128) op (sublane axis)


def _brute_kernel(
    tri_ref,  # [tri_chunk, 9] VMEM  (v0, e01, e02 components)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # [8, 128] VMEM
    prim_ref, dist_ref, bx_ref, by_ref,  # outputs [8, 128]
    *, num_tris: int, tri_chunk: int,
):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        prim_ref[:] = jnp.full_like(prim_ref, NULL_PRIMITIVE)
        dist_ref[:] = jnp.full_like(dist_ref, FLT_MAX)
        bx_ref[:] = jnp.zeros_like(bx_ref)
        by_ref[:] = jnp.zeros_like(by_ref)

    n_lane_blocks = RAY_BLOCK // 128

    def ray_block(b, _):
        row = pl.ds(b, 1)
        ox = ox_ref[row, :]  # (1, 128) = one row of 128 rays
        oy = oy_ref[row, :]
        oz = oz_ref[row, :]
        dx = dx_ref[row, :]
        dy = dy_ref[row, :]
        dz = dz_ref[row, :]

        best_prim = prim_ref[row, :]
        best_dist = dist_ref[row, :]
        best_bx = bx_ref[row, :]
        best_by = by_ref[row, :]

        def tri_group(g, carry):
            best_prim, best_dist, best_bx, best_by = carry
            t8 = tri_ref[pl.ds(g * TRI_SUB, TRI_SUB), :]  # (8, 9)
            col = lambda k: t8[:, k].reshape(TRI_SUB, 1)  # (8, 1)
            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)

            # Möller–Trumbore on (8 tris, 128 rays)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det0 = e1x * px + e1y * py + e1z * pz
            sign = jnp.where(det0 < 0.0, -1.0, 1.0)
            det = jnp.abs(det0)
            sx = (ox - v0x) * sign
            sy = (oy - v0y) * sign
            sz = (oz - v0z) * sign
            bx = sx * px + sy * py + sz * pz
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            by = dx * qx + dy * qy + dz * qz
            inv_det = 1.0 / jnp.where(det > 1e-30, det, 1e-30)
            tdist = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            tri_id = (
                c * tri_chunk
                + g * TRI_SUB
                + jax.lax.broadcasted_iota(jnp.int32, (TRI_SUB, 128), 0)
            )
            hit = (
                (det >= 1.1920929e-07)
                & (bx >= 0.0)
                & (bx <= det)
                & (by >= 0.0)
                & (bx + by <= det)
                & (tdist > 0.0)
                & (tri_id < num_tris)
            )
            tdist = jnp.where(hit, tdist, FLT_MAX)
            nbx = bx * inv_det
            nby = by * inv_det

            # per-ray min over the 8-triangle sublane axis, unrolled with
            # static row slices (Mosaic has no take_along_axis lowering)
            gdist = best_dist
            gprim = best_prim
            gbx = best_bx
            gby = best_by
            for s in range(TRI_SUB):
                cd = tdist[s : s + 1, :]
                upd = cd < gdist
                gdist = jnp.where(upd, cd, gdist)
                gprim = jnp.where(upd, tri_id[s : s + 1, :], gprim)
                gbx = jnp.where(upd, nbx[s : s + 1, :], gbx)
                gby = jnp.where(upd, nby[s : s + 1, :], gby)
            return gprim, gdist, gbx, gby

        best_prim, best_dist, best_bx, best_by = jax.lax.fori_loop(
            0, tri_chunk // TRI_SUB, tri_group,
            (best_prim, best_dist, best_bx, best_by),
        )
        prim_ref[row, :] = best_prim
        dist_ref[row, :] = best_dist
        bx_ref[row, :] = best_bx
        by_ref[row, :] = best_by
        return 0

    jax.lax.fori_loop(0, n_lane_blocks, ray_block, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_brute_pallas(tri_packed, ray_o, ray_d, interpret: bool = False):
    """Closest hit over all triangles — Pallas twin of
    :func:`radish_pt_tpu.accel.traverse.intersect_brute`.

    ``tri_packed``: f32[T, 9]; rays [N, 3].  Returns (prim, dist, bary).
    """
    n = ray_o.shape[0]
    num_tris = tri_packed.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    # size the triangle chunk to the scene: a 36-tri Cornell box must not pay
    # for a 512-tri sweep (padding waste was 93% of round-1 frame time)
    tri_chunk = min(TRI_CHUNK, -(-num_tris // TRI_SUB) * TRI_SUB)
    t_pad = -(-num_tris // tri_chunk) * tri_chunk

    tp = jnp.pad(tri_packed, ((0, t_pad - num_tris), (0, 0)))
    comps = []
    for arr, k in (
        (ray_o, 0), (ray_o, 1), (ray_o, 2),
        (ray_d, 0), (ray_d, 1), (ray_d, 2),
    ):
        c = jnp.pad(arr[:, k], (0, n_pad - n), constant_values=1.0)
        comps.append(c.reshape(n_pad // 128, 128))

    grid = (n_pad // RAY_BLOCK, t_pad // tri_chunk)
    ray_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda i, c: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (tri_chunk, 9), lambda i, c: (c, 0), memory_space=pltpu.VMEM
    )

    row_shape = (n_pad // 128, 128)
    out_shape = [
        jax.ShapeDtypeStruct(row_shape, jnp.int32),
        jax.ShapeDtypeStruct(row_shape, jnp.float32),
        jax.ShapeDtypeStruct(row_shape, jnp.float32),
        jax.ShapeDtypeStruct(row_shape, jnp.float32),
    ]
    prim, dist, bx, by = pl.pallas_call(
        functools.partial(_brute_kernel, num_tris=num_tris, tri_chunk=tri_chunk),
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 6,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(tp, *comps)

    prim = prim.reshape(-1)[:n]
    dist = dist.reshape(-1)[:n]
    bary = jnp.stack([bx.reshape(-1)[:n], by.reshape(-1)[:n]], axis=-1)
    return prim, dist, bary


def occlusion_brute_pallas(tri_packed, x, y, interpret: bool = False):
    """Shadow query via the dense kernel: closest hit vs segment length
    (dense any-hit == closest-hit here since the sweep is exhaustive)."""
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    max_dist = dist - eps
    ori = x + dirn * 1e-5
    prim, hit_dist, _ = intersect_brute_pallas(tri_packed, ori, dirn, interpret)
    return (prim != NULL_PRIMITIVE) & (hit_dist < max_dist)


# ---------------------------------------------------------------------------
# MXU Plücker intersector
# ---------------------------------------------------------------------------
#
# Möller–Trumbore's four decision quantities are all BILINEAR in per-ray
# features and per-triangle coefficients (Plücker coordinates):
#
#   det    = d·(e2×e1)
#   bx     = m·e2 − d·(e2×v0)          with m = o×d
#   by     = −m·e1 + d·(e1×v0)
#   t·det  = o·n − v0·n                with n = e1×e2
#
# so one [Tc,10] @ [10,128] MXU matmul per (tri-chunk, 128 rays) replaces the
# ~22 VPU ops/pair of cross-product arithmetic, leaving a ~17 ops/pair
# sign-free epilogue: multiplying the barycentric conditions through by det
# (bx·det ∈ [0, det²], t·det·det > 0, det² ≥ eps²) needs no sign
# normalization at all.  Origins are recentered on the scene to keep the
# m = o×d features well-conditioned.

PLUCKER_EPS2 = 1.1920929e-07 ** 2  # det² threshold == |det| >= eps
CLUSTER_SUB = 64  # triangles per cullable sub-cluster (one SMEM mask bit)

# Precision scheme for the LINEAR Plücker planes: Mosaic supports only
# DEFAULT and HIGHEST dot precisions, and HIGHEST (6-pass f32 emulation)
# streams 6x the MXU rows.  Instead the bf16x3 product is built by hand and
# folded into the K DIMENSION of ONE single-pass bf16 matmul:
#
#   q = [Chi | Chi | Clo] @ [Fhi; Flo; Fhi]        (K: 10 -> 30)
#
# (hi = bf16(x), lo = bf16(x - hi); the dropped lo*lo term is ~2^-32).
# Product noise is ~2^-16..-17 of the largest term.  The linear forms carry
# MT's own conditioning (NOT squared like the quadratic kernel's planes, for
# which this scheme measurably loses grazing hits), so decisions flip only
# within ~1e-5 of triangle extent of an edge and t errs ~3e-5 relative —
# invisible in a Monte Carlo render (and the renderer recomputes exact t
# from the winner id anyway, surface_info_from_t).  The segment tmax for
# shadows stays f32 in a separate row (bf16's 8-bit mantissa IS too coarse).
#
# Measured (v5e, 800x800 frames): the single-pass bf16 op wins on SMALL
# scenes where each [4*sub,K]@[K,128] op is latency-bound and the 6-pass
# HIGHEST chain serializes (cornell 36 tris: 32.2 -> 26.2 ms/frame,
# ReSTIR 36.9 -> 34.9); at teapot scale (4,350 tris) the two are a wash
# per-sweep and f32 avoids the 3x feature/coefficient prep, so the choice
# auto-switches on triangle count (override per call with ``bf16x3=``).


PLUCKER_BF16X3_MAX_TRIS = 2048  # auto threshold: <= this many tris -> bf16x3

# Precision modes for the linear Plücker engines (static ``bf16x3`` arg):
#   False — f32 coefficients, Mosaic HIGHEST dots (6-pass f32 emulation:
#           the MXU streams the M=4*sub plane rows SIX times per sweep —
#           measured to be what big-scene sweeps are bound by, round 3).
#   True  — 2-way bf16 split, 3 product terms K-stacked into ONE single-pass
#           bf16 dot (~2^-17 product noise; loses grazing winners above
#           ~2k tris — small scenes only).
#   "x6"  — 3-way bf16 split (b0+b1+b2 carries the FULL f32 mantissa), all
#           6 O(>=2^-16) product terms K-stacked into ONE single-pass dot:
#           f32-grade accuracy (~2.4e-7 relative, vs 1.2e-7 true f32) at
#           1/6th the MXU streaming of HIGHEST.  The big-scene default.


def _kdim(bf16x3) -> int:
    # x6 pads 60 -> 64: bf16 VMEM tiles are (16, 128) sublanes, and a K dim
    # that is not tile-aligned risks the matmul contracting padded rows
    return {False: 10, True: 30, "x6": 64}[bf16x3]


def _auto_prec(num_tris: int):
    """Small scenes: bf16x3 (latency-bound ops win).  Mid scenes: HIGHEST —
    their sweeps are VPU-epilogue-bound, so x6's 6x-smaller dot streaming
    buys nothing while its 2x coefficient/feature bytes cost ~2% (glass
    246.7 -> 252.3 ms measured).  Big scenes: x6 — the HIGHEST dot's
    M-row streaming shows above the epilogue there (hires sweep
    135.5 -> 100.4 ms)."""
    if num_tris <= PLUCKER_BF16X3_MAX_TRIS:
        return True
    return "x6" if num_tris > BIG_SCENE_TRIS else False


def _bf16_round(x):
    """Round f32 -> nearest-bf16 value, KEPT IN f32.  This must be
    lax.reduce_precision, not an astype round trip: XLA's excess-precision
    simplification deletes f32->bf16->f32 convert pairs under jit, which
    silently turns every split residual into zero (found round 3 — the
    round-2 bf16x3 path was degrading to PLAIN bf16 in jitted code)."""
    return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


def _split2(x):
    """2-way bf16 split: x == hi + lo + O(2^-17 |x|)."""
    hi = _bf16_round(x)
    lo = x - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _split3(x):
    """Exact 3-way bf16 split: x == b0 + b1 + b2 + O(2^-24 |x|) (each
    residual is exactly representable in f32 — Sterbenz)."""
    b0 = _bf16_round(x)
    r0 = x - b0
    b1 = _bf16_round(r0)
    r1 = r0 - b1
    return (b0.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
            r1.astype(jnp.bfloat16))


def _stack4(coeffs, sub, bf16x3):
    """[4, T, 10] plane coefficients -> [T//sub, 4*sub, 10|30|60]: all four
    decision planes of one sub-cluster stacked into the matmul M dimension
    (ONE MXU op per sweep instead of four latency-bound ones) and, for the
    bf16 modes, the split product terms stacked into K."""
    g, t, k = coeffs.shape
    ck = coeffs.reshape(g, t // sub, sub, k)
    ck = ck.transpose(1, 0, 2, 3).reshape(t // sub, g * sub, k)
    if bf16x3 is False:
        return ck
    if bf16x3 == "x6":
        c0, c1, c2 = _split3(ck)
        z = jnp.zeros_like(c0[..., :4])
        # pair order (C_i, F_j): (0,0) (0,1) (1,0) (0,2) (1,1) (2,0);
        # zero-padded 60 -> 64 (bf16 sublane tile alignment)
        return jnp.concatenate([c0, c0, c1, c0, c1, c2, z], axis=-1)
    hi, lo = _split2(ck)
    return jnp.concatenate([hi, hi, lo], axis=-1)  # [T//sub, 4*sub, 3k]


def _split_feats(feats, bf16x3):
    """[K, N] f32 ray features -> K-stacked split rows (see _stack4)."""
    if bf16x3 is False:
        return feats
    if bf16x3 == "x6":
        f0, f1, f2 = _split3(feats)
        z = jnp.zeros_like(f0[:4])
        return jnp.concatenate([f0, f1, f0, f2, f1, f0, z], axis=0)
    hi, lo = _split2(feats)
    return jnp.concatenate([hi, lo, hi], axis=0)


def _plucker_kernel(
    mask_ref,  # SMEM i32 [1, ROWS, n_chunks]: bit s => sweep sub-cluster s
    c_ref,  # [subs_per_chunk, 4*sub, 10] VMEM stacked coefficient planes
    f_ref,  # [10, RAY_BLOCK] VMEM ray features
    prim_ref, dist_ref,  # outputs [RAY_BLOCK//128, 128]
    prim_s, dist_s,  # VMEM scratch [n_pad//128, 128], persists across grid
    *, tri_chunk: int, n_chunks: int, sub: int, use_mask: bool, bf16x3: bool,
):
    # grid = (chunk OUTER, ray-block INNER): each [5, tri_chunk, 10]
    # coefficient block is DMA'd once per outer step (one pass over the
    # scene total) instead of once per (block, chunk) pair — the chunk
    # stream was ~12x the coefficient footprint in HBM traffic per sweep.
    # Because a ray block's best-hit state is revisited on NON-consecutive
    # grid steps, it accumulates in VMEM scratch (persistent across steps)
    # and flushes to the real outputs on the last chunk.
    c = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)

    @pl.when(c == 0)
    def _init():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_s[blk, :] = jnp.full(
            (RAY_BLOCK // 128, 128), NULL_PRIMITIVE, jnp.int32
        )
        dist_s[blk, :] = jnp.full((RAY_BLOCK // 128, 128), FLT_MAX, jnp.float32)

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=None if bf16x3 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    # Cull masks are per 128-ray ROW, not per 1024-ray block: sorted
    # wavefronts are far more coherent at row granularity, so each row
    # skips sub-clusters its 8x-wider block would have had to sweep.
    # winner ids are POSITIONAL (chunk base + sublane): the scene is stored
    # pre-permuted in BVH leaf order (scene/build.py), so no id matmul —
    # and the four decision planes ride ONE stacked [4*sub, 10] @ [10, 128]
    # MXU op per sweep (four separate [sub, 10] dots are latency-bound).
    # Winner selection packs the sublane index into the low 6 mantissa
    # bits of t (positive f32 order == int32 order): ONE integer
    # min-reduce replaces the (tmin, eq-select, idmin) pair; t is
    # quantized by <= 64 ulp (~2^-17 relative), far inside the f32 noise
    # of the intersection itself (same scheme as the quad kernel below).
    iota6 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    def _step_body():
        for s in range(tri_chunk // sub):
            cst = c_ref[s]  # [4*sub, 10] stacked planes
            id_base = c * tri_chunk + s * sub

            for r in range(RAY_BLOCK // 128):
                def _sweep(cst=cst, id_base=id_base, r=r):
                    f = f_ref[:, r * 128:(r + 1) * 128]  # [30, 128] bf16
                    q = dot(cst, f)  # ONE bf16 [4*sub, 30] @ [30, 128] MXU op
                    det = q[0 * sub:1 * sub, :]
                    bx = q[1 * sub:2 * sub, :]
                    by = q[2 * sub:3 * sub, :]
                    td = q[3 * sub:4 * sub, :]

                    sd = det * det
                    bxd = bx * det
                    byd = by * det
                    v = jnp.minimum(bxd, byd)
                    v = jnp.minimum(v, sd - bxd - byd)
                    v = jnp.minimum(v, sd - PLUCKER_EPS2)
                    tdd = td * det
                    # validity folded into ONE min: u >= 0 ⟺ v >= 0 &
                    # tdd >= 0 (exact-edge hits ACCEPTED like the brute
                    # oracle's inclusive tests — exclusive tests punched
                    # pixel holes along shared edges for pixel-center rays
                    # on axis-aligned walls; degenerate/padding rows stay
                    # rejected by the strictly negative eps plane)
                    u = jnp.minimum(v, tdd)
                    # t = td/det = tdd/sd via rsqrt (div is the single most
                    # expensive epilogue op); sd=0 lanes are invalid-masked
                    rs = jax.lax.rsqrt(sd)
                    tval = jnp.where(u >= 0.0, tdd * rs * rs, FLT_MAX)
                    kb = ~((1 << _key_bits(sub)) - 1)
                    key = (
                        jax.lax.bitcast_convert_type(tval, jnp.int32) & kb
                    ) | iota6
                    kmin = jnp.min(key, axis=0, keepdims=True)  # [1, 128]
                    tmin = jax.lax.bitcast_convert_type(
                        kmin & kb, jnp.float32
                    )
                    row = pl.ds(base + r, 1)
                    upd = (kmin < _key_miss(sub)) & (tmin < dist_s[row, :])
                    dist_s[row, :] = jnp.where(upd, tmin, dist_s[row, :])
                    prim_s[row, :] = jnp.where(
                        upd, (kmin & ~kb) + id_base, prim_s[row, :]
                    )

                if use_mask:
                    pl.when((mask_ref[0, r, c] >> s) & 1 != 0)(_sweep)
                else:
                    # no clusters -> statically unconditional (no branches)
                    _sweep()

    if use_mask:
        # step-level union guard: a (ray block, chunk) pair whose 8 rows flag
        # NO sub-cluster skips the whole 64-branch loop nest with one test —
        # after wavefront sorting most steps are empty, and their per-branch
        # scalar bookkeeping was a measurable share of mid-scene frames
        union = mask_ref[0, 0, c]
        for r in range(1, RAY_BLOCK // 128):
            union = union | mask_ref[0, r, c]
        pl.when(union != 0)(_step_body)
    else:
        _step_body()

    @pl.when(c == n_chunks - 1)
    def _flush():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_ref[:] = prim_s[blk, :]
        dist_ref[:] = dist_s[blk, :]


def _plucker_occl_kernel(
    mask_ref,  # SMEM i32 [1, ROWS, n_chunks]
    c_ref,  # [subs_per_chunk, 4*sub, 30] VMEM stacked bf16 planes
    f_ref,  # [30, RAY_BLOCK] VMEM bf16 ray features
    tm_ref,  # [1, RAY_BLOCK] VMEM f32 segment tmax
    occ_ref,  # output [RAY_BLOCK//128, 128] i32 (0/1)
    occ_s,  # VMEM scratch [n_pad//128, 128] i32, persists across grid
    *, tri_chunk: int, n_chunks: int, sub: int, use_mask: bool, bf16x3: bool,
    early_exit: bool = False,
):
    """ANY-HIT twin of :func:`_plucker_kernel` for shadow segments.

    Differences that make it ~40% cheaper per pair: no id matmul (4 dots,
    not 5), no division and no closest-hit min-reduce — the in-range test
    ``t < tmax`` is evaluated sign-safely as ``td*det < tmax*det^2``.
    """
    c = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)

    @pl.when(c == 0)
    def _init():
        occ_s[pl.ds(base, RAY_BLOCK // 128), :] = jnp.zeros(
            (RAY_BLOCK // 128, 128), jnp.int32
        )

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=None if bf16x3 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def _step_body():
        # ANY-HIT EARLY EXIT (round 5, big scenes only): a row whose every
        # lane is already occluded cannot change — skip all its remaining
        # sub-sweeps.  Evaluated ONCE per (grid step, row) as a 128-lane
        # min-reduce; within a step the flag is conservatively stale.  On
        # closeup scenes most shadow rows occlude on their own origin
        # cluster (hires 407 -> 404 ms bench / 394 frame probe).  STATIC
        # gate: the guard's data dependence on occ_s serializes Mosaic's
        # sweep pipeline, which costs small scenes more than the skips
        # recover (many_light 77.4 -> 83.5 ms measured) — callers enable
        # it above OCCL_EARLY_EXIT_MIN_TRIS.
        if early_exit:
            row_done = [
                jnp.min(occ_s[pl.ds(base + r, 1), :]) > 0
                for r in range(RAY_BLOCK // 128)
            ]
        else:
            row_done = [False] * (RAY_BLOCK // 128)
        for s in range(tri_chunk // sub):
            cst = c_ref[s]  # [4*sub, 30] stacked bf16 planes

            for r in range(RAY_BLOCK // 128):
                def _sweep(cst=cst, r=r):
                    row = pl.ds(base + r, 1)
                    f = f_ref[:, r * 128:(r + 1) * 128]  # [30, 128] bf16
                    q = dot(cst, f)  # ONE bf16 [4*sub, 30] @ [30, 128] MXU op
                    det = q[0 * sub:1 * sub, :]
                    bx = q[1 * sub:2 * sub, :]
                    by = q[2 * sub:3 * sub, :]
                    td = q[3 * sub:4 * sub, :]

                    sd = det * det
                    bxd = bx * det
                    byd = by * det
                    v = jnp.minimum(bxd, byd)
                    v = jnp.minimum(v, sd - bxd - byd)
                    v = jnp.minimum(v, sd - PLUCKER_EPS2)
                    tdd = td * det
                    tm = tm_ref[:, r * 128:(r + 1) * 128]  # [1, 128] f32
                    # hit ⟺ v > 0 & tdd > 0 & tm*sd - tdd > 0, folded into
                    # one min so the per-pair compare/and chain becomes a
                    # single f32 max-reduce + one per-row compare (the sign
                    # of a f32 subtraction is always exact, so the range
                    # test is unchanged; v == 0 edge hits drop, matching
                    # the quad kernel)
                    w = jnp.minimum(jnp.minimum(v, tdd), tm * sd - tdd)
                    wmax = jnp.max(w, axis=0, keepdims=True)
                    occ_s[row, :] = occ_s[row, :] | (wmax >= 0.0).astype(
                        jnp.int32
                    )

                if use_mask and early_exit:
                    pl.when(
                        ((mask_ref[0, r, c] >> s) & 1 != 0)
                        & jnp.logical_not(row_done[r])
                    )(_sweep)
                elif use_mask:
                    pl.when((mask_ref[0, r, c] >> s) & 1 != 0)(_sweep)
                elif early_exit:
                    pl.when(jnp.logical_not(row_done[r]))(_sweep)
                else:
                    _sweep()

    if use_mask:
        # step-level union guard (see _plucker_kernel)
        union = mask_ref[0, 0, c]
        for r in range(1, RAY_BLOCK // 128):
            union = union | mask_ref[0, r, c]
        pl.when(union != 0)(_step_body)
    else:
        _step_body()

    @pl.when(c == n_chunks - 1)
    def _flush():
        occ_ref[:] = occ_s[pl.ds(base, RAY_BLOCK // 128), :]


# below this many triangles the early-exit guard's pipeline serialization
# costs more than the skipped sub-sweeps recover (see _plucker_occl_kernel)
OCCL_EARLY_EXIT_MIN_TRIS = 16384


def _plucker_coeffs(tri_packed, center, prim_ids):
    """Per-triangle coefficient rows [5, T, 10] from packed v0/e1/e2; the
    fifth group carries the ORIGINAL prim id in the constant-1 slot so the
    kernel emits real ids for spatially permuted triangles for free."""
    v0 = tri_packed[:, 0:3] - center
    e1 = tri_packed[:, 3:6]
    e2 = tri_packed[:, 6:9]
    n = jnp.cross(e1, e2)
    z3 = jnp.zeros_like(v0)
    z1 = jnp.zeros_like(v0[:, :1])
    c_det = jnp.concatenate([jnp.cross(e2, e1), z3, z3, z1], axis=1)
    c_bx = jnp.concatenate([-jnp.cross(e2, v0), e2, z3, z1], axis=1)
    c_by = jnp.concatenate([jnp.cross(e1, v0), -e1, z3, z1], axis=1)
    c_td = jnp.concatenate(
        [z3, z3, n, -jnp.sum(v0 * n, axis=1, keepdims=True)], axis=1
    )
    c_id = jnp.concatenate(
        [z3, z3, z3, prim_ids.astype(jnp.float32)[:, None]], axis=1
    )
    return jnp.stack([c_det, c_bx, c_by, c_td, c_id], axis=0)  # [5, T, 10]


def _cluster_mask_bits(cluster_bounds, ray_o, ray_d, tmax, n_blocks, n_chunks,
                       subs_per_chunk):
    """XLA prepass: per (128-ray row, tri chunk) bitmask of sub-clusters any
    ray in the row might hit (conservative slab test, entry < tmax).
    Returns i32 [n_blocks, ROWS_PER_BLOCK, n_chunks]."""
    n_pad = n_blocks * RAY_BLOCK
    o = jnp.pad(ray_o, ((0, n_pad - ray_o.shape[0]), (0, 0)))
    d = jnp.pad(ray_d, ((0, n_pad - ray_d.shape[0]), (0, 0)),
                constant_values=1.0)
    if tmax is None:
        tm = jnp.full((n_pad, 1), FLT_MAX)
    else:
        tm = jnp.pad(tmax, (0, n_pad - tmax.shape[0]))[:, None]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tn = jnp.full((n_pad, cluster_bounds.shape[0]), -FLT_MAX)
    tf = jnp.full((n_pad, cluster_bounds.shape[0]), FLT_MAX)
    for k in range(3):
        a = (cluster_bounds[None, :, k] - o[:, k, None]) * inv[:, k, None]
        b = (cluster_bounds[None, :, 3 + k] - o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tm)  # [n_pad, C]
    rows = n_blocks * (RAY_BLOCK // 128)
    hit = hit.reshape(rows, 128, -1).any(axis=1)  # [rows, C]
    c_tot = hit.shape[-1]
    pad_c = n_chunks * subs_per_chunk - c_tot
    hit = jnp.pad(hit, ((0, 0), (0, pad_c)))
    bits = hit.reshape(rows, n_chunks, subs_per_chunk).astype(jnp.int32)
    weights = (1 << jnp.arange(subs_per_chunk, dtype=jnp.int32))[None, None]
    packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.int32)  # [rows, n_chunks]
    return packed.reshape(n_blocks, RAY_BLOCK // 128, n_chunks)


# Cluster-count threshold above which the scan engines' [rays, C] slab
# prepass would switch to the MXU sphere test (_sphere_flags).  MEASURED
# OUT on v5e (round 2, tools/prepassbench.py + tools/frame_ab.py at
# teapot_hires, 111k tris / 1,755 clusters): XLA fuses the slab test to
# ~7.6 ms per 640k-lane sweep — NOT the bottleneck — while the sphere
# flags are 1.6-1.8x looser row-union (tools/sphere_tightness.py), which
# inflated the hires frame 853 -> 1979 ms.  The path is kept (tested via
# monkeypatch) in case a future memory-bound regime changes the balance;
# do not re-enable without re-running frame_ab.
_SCAN_SPHERE_MIN_C = 1 << 30


def _scan_mask_bits(cluster_bounds, center, ray_o, ray_d, tmax,
                    n_blocks, n_chunks, subs_per_chunk, interpret=False):
    """Dispatch the scan engines' cull-mask prepass: exact slab test for
    small cluster counts, MXU sphere test above _SCAN_SPHERE_MIN_C.
    Requires |ray_d| = 1 on the sphere path (all engine callers normalize)."""
    C = cluster_bounds.shape[0]
    if C < _SCAN_SPHERE_MIN_C:
        return _cluster_mask_bits(cluster_bounds, ray_o, ray_d, tmax,
                                  n_blocks, n_chunks, subs_per_chunk)
    n_pad = n_blocks * RAY_BLOCK
    o, d, tm = _pad_rays(ray_o, ray_d, tmax, n_pad)
    rows = n_blocks * (RAY_BLOCK // 128)
    flags = _sphere_flags(cluster_bounds, center, o - center, d, tm,
                          rows, lanes=128, interpret=interpret)
    pad_c = n_chunks * subs_per_chunk - C
    f = jnp.pad(flags[:, :C], ((0, 0), (0, pad_c)))
    bits = f.reshape(rows, n_chunks, subs_per_chunk).astype(jnp.int32)
    w = (1 << jnp.arange(subs_per_chunk, dtype=jnp.int32))[None, None]
    packed = jnp.sum(bits * w, axis=-1, dtype=jnp.int32)
    return packed.reshape(n_blocks, RAY_BLOCK // 128, n_chunks)


@functools.partial(
    jax.jit, static_argnames=("interpret", "bf16x3", "cluster_sub")
)
def intersect_plucker_pallas(
    tri_packed, ray_o, ray_d,
    tri_order=None, cluster_bounds=None, tmax=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, bf16x3: bool | None = None,
    cluster_sub: int | None = None,
):
    """Closest hit over all triangles via the MXU Plücker formulation.

    Returns (prim i32[N], dist f32[N]).  Barycentrics are NOT produced —
    recover them by projecting the hit point onto the winning triangle
    (device_scene.surface_info_from_t), which needs no extra gather.

    ``tri_order`` (i32 [T], a spatial permutation, e.g. BVH leaf order) and
    ``cluster_bounds`` (f32 [C, 6] AABBs over consecutive CLUSTER_SUB-sized
    groups of the PERMUTED triangles) enable per-ray-block sub-cluster
    culling: a slab-test prepass builds one bitmask per (block, chunk) and
    the kernel skips unflagged 64-triangle groups with a scalar branch.
    ``tmax`` (f32 [N]) tightens the prepass for segment queries (shadows).
    """
    n = ray_o.shape[0]
    if n > MAX_LANES_PER_LAUNCH:
        # VMEM hit-state scratch is sized to the whole launch (n_pad * 8 B);
        # split oversized wavefronts so 1080p+ cannot exceed the VMEM budget.
        prims, dists = [], []
        for lo in range(0, n, MAX_LANES_PER_LAUNCH):
            hi = lo + MAX_LANES_PER_LAUNCH
            p, t = intersect_plucker_pallas(
                tri_packed, ray_o[lo:hi], ray_d[lo:hi],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                tmax=None if tmax is None else tmax[lo:hi],
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, bf16x3=bf16x3,
                cluster_sub=cluster_sub,
            )
            prims.append(p)
            dists.append(t)
        return jnp.concatenate(prims), jnp.concatenate(dists)
    num_tris = tri_packed.shape[0]
    if bf16x3 is None:
        bf16x3 = _auto_prec(num_tris)
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    sub, tri_chunk, t_pad = _chunking(num_tris, cluster_sub)
    n_blocks = n_pad // RAY_BLOCK
    n_chunks = t_pad // tri_chunk
    subs_per_chunk = tri_chunk // sub

    pre = _take_pre_coeffs(coeffs_pre, center_pre, sub, t_pad,
                           _kdim(bf16x3), tri_order=tri_order)
    if pre is not None:
        coeffs, center = pre
    else:
        if tri_order is not None:
            tri_packed = tri_packed[tri_order]

        v0 = tri_packed[:, 0:3]
        center = jax.lax.stop_gradient(
            0.5 * (v0.min(axis=0) + v0.max(axis=0))
        )
        # kernel ids are positional (chunk base + sublane) — the id
        # coefficient row is not needed; tri_order (if any) is remapped
        # after the kernel
        coeffs = _plucker_coeffs(
            tri_packed, center, jnp.arange(num_tris, dtype=jnp.int32)
        )[0:4]
        # padding rows are all-zero -> det==0 -> never valid
        coeffs = jnp.pad(coeffs, ((0, 0), (0, t_pad - num_tris), (0, 0)))
        coeffs = _stack4(coeffs, sub, bf16x3)  # [t_pad//sub, 4*sub, 10|30]

    use_mask = cluster_bounds is not None
    if use_mask:
        mask = _scan_mask_bits(
            cluster_bounds, center, ray_o, ray_d, tmax,
            n_blocks, n_chunks, subs_per_chunk, interpret=interpret,
        )
    else:  # unread by the kernel (use_mask=False skips every branch)
        mask = jnp.zeros((n_blocks, 1, 1), jnp.int32)

    o = ray_o - center
    m = jnp.cross(o, ray_d)
    feats = jnp.concatenate(
        [ray_d, m, o, jnp.ones_like(o[:, :1])], axis=1
    )  # [N, 10]
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    feats = _split_feats(feats.T, bf16x3)  # [10|30, N_pad]

    grid = (n_chunks, n_blocks)  # chunk outer, ray block inner (see kernel)
    mask_spec = pl.BlockSpec(
        (1,) + mask.shape[1:], lambda c, i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )
    kdim = _kdim(bf16x3)
    c_spec = pl.BlockSpec(
        (tri_chunk // sub, 4 * sub, kdim), lambda c, i: (c, 0, 0),
        memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (kdim, RAY_BLOCK), lambda c, i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda c, i: (i, 0), memory_space=pltpu.VMEM
    )
    row_shape = (n_pad // 128, 128)
    prim, dist = pl.pallas_call(
        functools.partial(
            _plucker_kernel, tri_chunk=tri_chunk, n_chunks=n_chunks,
            sub=sub, use_mask=use_mask, bf16x3=bf16x3,
        ),
        grid=grid,
        in_specs=[mask_spec, c_spec, f_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(row_shape, jnp.int32),
            jax.ShapeDtypeStruct(row_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(row_shape, jnp.int32),
            pltpu.VMEM(row_shape, jnp.float32),
        ],
        interpret=interpret,
    )(mask, coeffs, feats)

    prim = prim.reshape(-1)[:n]
    dist = dist.reshape(-1)[:n]
    prim = jnp.where(dist < FLT_MAX, prim, NULL_PRIMITIVE)
    if tri_order is not None:
        # kernel ids are positions into the permuted table
        prim = jnp.where(
            prim >= 0, tri_order[jnp.maximum(prim, 0)], NULL_PRIMITIVE
        )
    return prim, dist


@functools.partial(
    jax.jit, static_argnames=("interpret", "bf16x3", "cluster_sub")
)
def occlusion_plucker_pallas(tri_packed, x, y,
                             tri_order=None, cluster_bounds=None,
                             coeffs_pre=None, center_pre=None,
                             interpret: bool = False,
                             bf16x3: bool | None = None,
                             cluster_sub: int | None = None):
    """Shadow query via the dedicated ANY-HIT MXU kernel (no id matmul,
    no division, no closest-hit reduce, per-row early-out); the segment
    length bounds both the culling prepass and the in-range test."""
    if x.shape[0] > MAX_LANES_PER_LAUNCH:
        # see intersect_plucker_pallas: cap per-launch VMEM scratch
        return jnp.concatenate([
            occlusion_plucker_pallas(
                tri_packed, x[lo:lo + MAX_LANES_PER_LAUNCH],
                y[lo:lo + MAX_LANES_PER_LAUNCH],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, bf16x3=bf16x3,
                cluster_sub=cluster_sub,
            )
            for lo in range(0, x.shape[0], MAX_LANES_PER_LAUNCH)
        ])
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    max_dist = dist - eps
    ray_o = x + dirn * 1e-5
    ray_d = dirn

    n = ray_o.shape[0]
    num_tris = tri_packed.shape[0]
    if bf16x3 is None:
        bf16x3 = _auto_prec(num_tris)
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    sub, tri_chunk, t_pad = _chunking(num_tris, cluster_sub)
    n_blocks = n_pad // RAY_BLOCK
    n_chunks = t_pad // tri_chunk
    subs_per_chunk = tri_chunk // sub

    pre = _take_pre_coeffs(coeffs_pre, center_pre, sub, t_pad,
                           _kdim(bf16x3), tri_order=tri_order)
    if pre is not None:
        coeffs, center = pre
    else:
        if tri_order is not None:
            tri_packed = tri_packed[tri_order]

        v0 = tri_packed[:, 0:3]
        center = jax.lax.stop_gradient(
            0.5 * (v0.min(axis=0) + v0.max(axis=0))
        )
        coeffs = _plucker_coeffs(
            tri_packed, center, jnp.arange(num_tris, dtype=jnp.int32)
        )[0:4]
        coeffs = jnp.pad(coeffs, ((0, 0), (0, t_pad - num_tris), (0, 0)))
        coeffs = _stack4(coeffs, sub, bf16x3)  # [t_pad//sub, 4*sub, 10|30]

    use_mask = cluster_bounds is not None
    if use_mask:
        mask = _scan_mask_bits(
            cluster_bounds, center, ray_o, ray_d, max_dist,
            n_blocks, n_chunks, subs_per_chunk, interpret=interpret,
        )
    else:  # unread by the kernel (use_mask=False skips every branch)
        mask = jnp.zeros((n_blocks, 1, 1), jnp.int32)

    o = ray_o - center
    m = jnp.cross(o, ray_d)
    feats = jnp.concatenate(
        [ray_d, m, o, jnp.ones_like(o[:, :1])], axis=1
    )  # [N, 10]
    # padding rays: zero geometry features -> every dot is 0, so the
    # |det|>=eps plane already fails (v = -eps^2 < 0); the separate f32
    # tmax row gets a negative sentinel as belt-and-braces.
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)))
    feats = _split_feats(feats.T, bf16x3)  # [10|30, N_pad]
    tmrow = jnp.pad(max_dist, (0, n_pad - n), constant_values=-FLT_MAX)
    tmrow = tmrow[None, :]  # [1, N_pad] f32

    grid = (n_chunks, n_blocks)
    mask_spec = pl.BlockSpec(
        (1,) + mask.shape[1:], lambda c, i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )
    kdim = _kdim(bf16x3)
    c_spec = pl.BlockSpec(
        (tri_chunk // sub, 4 * sub, kdim), lambda c, i: (c, 0, 0),
        memory_space=pltpu.VMEM
    )
    f_spec = pl.BlockSpec(
        (kdim, RAY_BLOCK), lambda c, i: (0, i), memory_space=pltpu.VMEM
    )
    tm_spec = pl.BlockSpec(
        (1, RAY_BLOCK), lambda c, i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda c, i: (i, 0), memory_space=pltpu.VMEM
    )
    row_shape = (n_pad // 128, 128)
    occ = pl.pallas_call(
        functools.partial(
            _plucker_occl_kernel, tri_chunk=tri_chunk, n_chunks=n_chunks,
            sub=sub, use_mask=use_mask, bf16x3=bf16x3,
            early_exit=tri_packed.shape[0] >= OCCL_EARLY_EXIT_MIN_TRIS,
        ),
        grid=grid,
        in_specs=[mask_spec, c_spec, f_spec, tm_spec],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct(row_shape, jnp.int32)],
        scratch_shapes=[pltpu.VMEM(row_shape, jnp.int32)],
        interpret=interpret,
    )(mask, coeffs, feats, tmrow)[0]

    return occ.reshape(-1)[:n] != 0


# NOTE (round 2, measured): a VMEM-resident variant with a per-block
# near-to-far cluster schedule and per-row scalar early-outs (skip clusters
# once rowmax(best_t) < next entry / once a row is fully occluded) was built
# and benched at teapot scale: the per-sweep vector->scalar reduce feeding
# the next iteration's branch costs ~6-9 ms per 640k-lane sweep — more than
# the skipped work saves — and a lag-2 rotating-slot scheme did not help
# (the reduce itself stalls the scalar unit, not the dependency).  In-kernel
# dynamic early-out is a dead end on this hardware; the win came from
# M-stacking the decision planes into one MXU op instead (see above).

# ---------------------------------------------------------------------------
# Compacted work-list MXU intersector (round 2)
# ---------------------------------------------------------------------------
#
# The chunk-grid kernels above cull at (128-ray row) x (64-tri sub-cluster)
# granularity but still SCAN every (row, sub) pair: the grid walks all
# chunks for every ray block and a scalar branch skips unflagged sweeps.
# Two costs remain: the per-step pipeline bookkeeping of skipped pairs, and
# the ROW-UNION waste (a row sweeps the union of its 128 rays' clusters —
# measured 7.4 clusters/row vs a 3.0 clusters/ray floor, BASELINE.md).
#
# This variant instead COMPACTS the flagged pairs into an explicit work
# list on the XLA side (one argsort) and lets the kernel's grid walk the
# list via scalar-prefetched indices (PrefetchScalarGridSpec): grid step w
# DMAs exactly coefficient block work_sub[w] and ray-feature row
# work_row[w], does its single stacked MXU op, and folds the result into
# the launch-resident hit state (the out blocks use a constant index map,
# so they stay in VMEM for the whole launch and flush once).  Work beyond
# the true count repeats item 0 (same block indices -> no DMA; the body is
# also scalar-skipped).  Duplicated items are harmless by construction:
# the hit-state update is an idempotent min/or.
#
# Scaling: the sweep cost is now O(sum of flags) instead of
# O(rows x clusters) scans, which is what makes >65k-triangle scenes
# viable (the scan alone at 100k tris is ~1,563 clusters x 5,000 rows of
# pipeline steps).  The prepass stays the per-ray slab test for small
# scenes and switches to a per-row cone test above _PER_RAY_PREPASS_MAX
# clusters (O(rows x clusters) instead of O(rays x clusters)).


COMPACT_MAX_LANES = 640 * 1024  # out blocks resident in VMEM: 8 B/lane

# Tuning applied by the scene-level dispatch (device_scene) when the scene's
# intersector is "pallas_compact".  Mutate at startup (CLI --compact-tuning,
# or after a tools/tpu_triage.py sweep): values are read at TRACE time, so
# they must be set before the first jit of a render loop.
COMPACT_TUNING = {"work_per_row": 24, "group": 2, "fan": 1}
# cull-unit count the per-ray slab prepass is sized for (the slab test
# materializes [rays, C] f32 intermediates, so it must stay narrow).
# Bigger scenes switch to the MXU SPHERE prepass (below): exact per-ray
# ray-vs-bounding-sphere tests at FINE 64-tri granularity as one matmul,
# so no coarsening of the work unit is needed until _SPHERE_UNIT_MAX.
# Round-1 history: a row-cone prepass at 111k tris flagged ~650/1738 units
# (~120x looser than exact -> permanent dense fallback); the per-ray exact
# test at the same granularity flags 5.4/ray.
_PER_RAY_PREPASS_MAX = 256
# sphere-prepass unit ceiling: above this many fine clusters, g consecutive
# fine clusters merge into one work unit (the sphere test and the sweep
# both coarsen; exact fine gating above ~262k tris is a round-3 item).
_SPHERE_UNIT_MAX = 4096
# scalar-memory budget for the prefetched work list (v5e has ~1 MB SMEM;
# leave headroom for the count word and compiler spill slots)
_SMEM_WORK_BYTES = 800_000


def _coarsen_bounds(cluster_bounds, g: int):
    """Merge ``g`` consecutive fine cluster AABBs into one cull-unit AABB.
    Padding units get inverted boxes (lo=+inf, hi=-inf): the slab test can
    never flag them."""
    C = cluster_bounds.shape[0]
    pad = -C % g
    lo = jnp.pad(cluster_bounds[:, 0:3], ((0, pad), (0, 0)),
                 constant_values=FLT_MAX).reshape(-1, g, 3).min(axis=1)
    hi = jnp.pad(cluster_bounds[:, 3:6], ((0, pad), (0, 0)),
                 constant_values=-FLT_MAX).reshape(-1, g, 3).max(axis=1)
    return jnp.concatenate([lo, hi], axis=1)


def _pad_rays(ray_o, ray_d, tmax, n_pad):
    """Pad a wavefront to ``n_pad`` lanes.  Padding lanes get tmax=-inf so
    their fake rays can never flag cull units (they inflated the work list
    and could trip the dense fallback on odd-sized wavefronts)."""
    o = jnp.pad(ray_o, ((0, n_pad - ray_o.shape[0]), (0, 0)))
    d = jnp.pad(ray_d, ((0, n_pad - ray_d.shape[0]), (0, 0)),
                constant_values=1.0)
    if tmax is None:
        tm = jnp.full((ray_o.shape[0],), FLT_MAX)
    else:
        tm = tmax
    tm = jnp.pad(tm, (0, n_pad - tm.shape[0]), constant_values=-FLT_MAX)
    return o, d, tm


def _row_flags(cull_bounds, o, d, tm, rows, lanes: int = 128,
               with_tn: bool = False):
    """Per-(``lanes``-ray group, cull-unit) visit flags, bool [rows, C]:
    exact per-ray slab test OR-reduced over the group (the exact union).
    Rays are pre-padded (:func:`_pad_rays`) to rows*lanes.  Callers keep
    C <= _PER_RAY_PREPASS_MAX via :func:`_coarsen_bounds`.

    ``with_tn``: also return f32 [rows, C] conservative entry distances —
    min over the group's FLAGGING lanes of max(slab entry, 0), FLT_MAX
    where no lane flags.  Any true hit t inside the unit satisfies
    t >= tn for every flagging lane, so tn lower-bounds the unit's
    contribution to the whole row group (the near-to-far work-list order
    and the in-kernel termination test both ride on this bound)."""
    n_pad = rows * lanes
    C = cull_bounds.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tn = jnp.full((n_pad, C), -FLT_MAX)
    tf = jnp.full((n_pad, C), FLT_MAX)
    for k in range(3):
        a = (cull_bounds[None, :, k] - o[:, k, None]) * inv[:, k, None]
        b = (cull_bounds[None, :, 3 + k] - o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tm[:, None])
    flags = hit.reshape(rows, lanes, C).any(axis=1)
    if not with_tn:
        return flags
    tn_pos = jnp.where(hit, jnp.maximum(tn, 0.0), FLT_MAX)
    tn_row = tn_pos.reshape(rows, lanes, C).min(axis=1)
    return flags, tn_row


# --- MXU sphere prepass -----------------------------------------------------
#
# For C > _PER_RAY_PREPASS_MAX cull units, the per-ray slab test's
# [rays, C] f32 intermediates get too big — but an EXACT per-ray
# ray-vs-bounding-SPHERE test is bilinear in (per-unit constants, per-ray
# features), so the whole [rays, C] visibility problem is one MXU matmul.
# With unit-length d, o taken relative to the scene center, m = o x d:
#
#   dist^2(ray, p) = |d x (p - o)|^2 = |p|^2|d|^2 - (d.p)^2 + 2 p.(m x d) + |m|^2
#   t*             = d.p - d.o              (closest-approach parameter)
#
# Three affine decision planes, each a dot of 16 ray features
# [dd6, (m x d)3, |m|^2, d.o, d3, tm, 1]:
#
#   A = r^2 - dist^2          >= 0   (ray line passes within r of center)
#   C = t* + r                >= 0   (sphere not entirely behind the origin)
#   E = tm - t* + r           >= 0   (sphere window starts before tmax)
#
# hit iff min(A, C, E) >= 0.  The sphere (center = box center, r = half
# diagonal + slack) contains the cluster AABB, and the t-window uses the
# conservative half-width r >= sqrt(r^2 - dist^2), so flags are a strict
# superset of the exact slab flags: never a false miss.  Requires |d| = 1
# (all engine callers normalize); the |p|^2|d|^2 term is carried exactly
# through the dd features so A tolerates small normalization error.

_SPHERE_K = 16


_SPHERE_NEG = -1e37  # "never flags" (finite: -FLT_MAX would become -inf
#                      in bf16 and poison the matmul via 0 * inf)


def _sphere_feats(o, d, tm):
    """Per-ray sphere-test features, f32 [N, 16] (see block comment).
    tm is clamped to +-1e37 so its bf16 hi part stays finite.

    tm <= 0 lanes are forced to -1e37 (plane E kills them): a segment
    window [0, tm] with tm <= 0 is empty, so this is exact — and it
    protects the flags from DEGENERATE rays (masked shadow lanes use a
    zero-length segment whose d normalizes to ~0, which would otherwise
    zero the dd/md/m2 features and make plane A flag every unit)."""
    mm = jnp.cross(o, d)
    dd6 = jnp.stack(
        [d[:, 0] * d[:, 0], d[:, 1] * d[:, 1], d[:, 2] * d[:, 2],
         d[:, 0] * d[:, 1], d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]],
        axis=1,
    )
    md = jnp.cross(mm, d)
    m2 = jnp.sum(mm * mm, axis=1, keepdims=True)
    do = jnp.sum(d * o, axis=1, keepdims=True)
    one = jnp.ones_like(m2)
    tmc = jnp.where(tm > 0.0, jnp.clip(tm, -1e37, 1e37), -1e37)
    return jnp.concatenate(
        [dd6, md, m2, do, d, tmc[:, None], one], axis=1
    )


def _sphere_plane_coeffs(unit_bounds, center):
    """[3, 16, C] plane-coefficient matrices (A, C, E) for the sphere
    prepass.  ``unit_bounds`` [C, 6] may contain inverted padding boxes
    (lo=+inf): those units get a -1e37 constant term and can never flag.

    The slack terms keep the test conservative under the bf16x3 matmul
    (~2^-17 relative per product; terms are O(scale^2) for A, O(scale)
    for C/E, so a 2e-4 * scale^n margin covers the worst-case sum)."""
    lo, hi = unit_bounds[:, 0:3], unit_bounds[:, 3:6]
    valid = jnp.all(hi >= lo, axis=1)
    lo = jnp.where(valid[:, None], lo, 0.0)
    hi = jnp.where(valid[:, None], hi, 0.0)
    p = 0.5 * (lo + hi) - center[None]  # [C, 3] rel scene center
    r = 0.5 * jnp.linalg.norm(hi - lo, axis=1)  # half diagonal
    scale = jnp.max(jnp.where(valid, jnp.linalg.norm(p, axis=1) + r, 0.0))
    pp = jnp.sum(p * p, axis=1)
    rr = r * r + 2e-4 * scale * scale + 1e-12
    rl = r + 2e-4 * scale + 1e-6
    z = jnp.zeros_like(r)
    # A: [dd: p_i p_j - |p|^2 delta_ij] . dd6 - 2 p . md - m2 + r^2
    a = jnp.stack(
        [p[:, 0] ** 2 - pp, p[:, 1] ** 2 - pp, p[:, 2] ** 2 - pp,
         2 * p[:, 0] * p[:, 1], 2 * p[:, 0] * p[:, 2],
         2 * p[:, 1] * p[:, 2],
         -2 * p[:, 0], -2 * p[:, 1], -2 * p[:, 2],
         -jnp.ones_like(r), z,
         z, z, z, z,
         jnp.where(valid, rr, _SPHERE_NEG)],
        axis=1,
    )
    # C: t* + r = p . d - d.o + r
    c = jnp.stack(
        [z, z, z, z, z, z, z, z, z, z, -jnp.ones_like(r),
         p[:, 0], p[:, 1], p[:, 2], z,
         jnp.where(valid, rl, _SPHERE_NEG)],
        axis=1,
    )
    # E: tm - t* + r = tm - p . d + d.o + r
    e = jnp.stack(
        [z, z, z, z, z, z, z, z, z, z, jnp.ones_like(r),
         -p[:, 0], -p[:, 1], -p[:, 2], jnp.ones_like(r),
         jnp.where(valid, rl, _SPHERE_NEG)],
        axis=1,
    )
    return jnp.stack([a, c, e]).transpose(0, 2, 1)  # [3, 16, C]


def _sphere_flag_kernel(f_ref, a_ref, c_ref, e_ref, rl2_ref, out_ref, tn_ref,
                        *, lanes):
    """One (cluster tile, 8 row groups) step: 3 MXU ops + min + per-group
    any-reduce (8 row groups per step so the out block is (8, ctile)).
    Inputs are bf16x3-split (K = 48): single-pass bf16 matmuls with ~2^-17
    relative error, covered by the coefficients' slack terms.

    Second output: per-group conservative entry distance tn = min over
    flagging lanes of max(t* - rl, 0).  The C plane value is t* + rl, so
    t* - rl = cv - 2*rl (``rl2_ref`` carries 2*rl per unit); any true hit
    in the unit has t >= t* - halfwidth >= t* - rl."""
    dot = lambda x, w: jax.lax.dot_general(  # noqa: E731
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    f = f_ref[...]
    cv = dot(f, c_ref[...])
    v = jnp.minimum(dot(f, a_ref[...]), cv)
    v = jnp.minimum(v, dot(f, e_ref[...]))
    flag = v >= 0.0
    hit = flag.astype(jnp.int32)
    tn = jnp.where(flag, jnp.maximum(cv - rl2_ref[...], 0.0), FLT_MAX)
    for j in range(8):
        out_ref[j:j + 1, :] = jnp.max(
            hit[j * lanes:(j + 1) * lanes], axis=0, keepdims=True
        )
        tn_ref[j:j + 1, :] = jnp.min(
            tn[j * lanes:(j + 1) * lanes], axis=0, keepdims=True
        )


def _sphere_flags(unit_bounds, center, o, d, tm, rowblks, lanes,
                  interpret=False, with_tn: bool = False):
    """Exact per-ray sphere visit flags, bool [rowblks, C_pad]: the MXU
    prepass for big scenes.  Rays pre-padded to rowblks*lanes (dead/padding
    lanes have tm = -inf, so plane E kills them).

    ``with_tn``: also return f32 [rowblks, C] conservative entry distances
    (min over flagging lanes of the sphere-window start; FLT_MAX where no
    lane flags) — see :func:`_row_flags`."""
    C = unit_bounds.shape[0]
    # v intermediate is (8*lanes, ctile) f32: hold it at ~4 MB as the
    # group (lanes) grows
    ctile = min(-(-C // 128) * 128, max(128, (131072 // lanes) // 128 * 128))
    C_pad = -(-C // ctile) * ctile
    planes = _sphere_plane_coeffs(unit_bounds, center)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, C_pad - C)),
                     constant_values=_SPHERE_NEG)  # padding units never flag
    # 2*rl per unit for the tn epilogue (cv - 2*rl = t* - rl); the C plane's
    # constant term IS rl for valid units (see _sphere_plane_coeffs)
    rl2 = 2.0 * jnp.maximum(planes[1, 15:16, :], 0.0)  # [1, C_pad] f32
    p_hi, p_lo = _split2(planes)
    planes = jnp.concatenate([p_hi, p_hi, p_lo], axis=1)  # [3, 48, C_pad]
    feats = _sphere_feats(o, d, tm)  # [rowblks*lanes, 16]
    f_hi, f_lo = _split2(feats)
    feats = jnp.concatenate([f_hi, f_lo, f_hi], axis=1)  # [N, 48]
    rb_pad = -(-rowblks // 8) * 8
    if rb_pad != rowblks:  # zero-feature pad rows flag; sliced off below
        feats = jnp.pad(feats, ((0, (rb_pad - rowblks) * lanes), (0, 0)))
    grid = (C_pad // ctile, rb_pad // 8)
    f_spec = pl.BlockSpec((8 * lanes, 3 * _SPHERE_K), lambda ct, rb: (rb, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((3 * _SPHERE_K, ctile), lambda ct, rb: (0, ct),
                          memory_space=pltpu.VMEM)
    rl2_spec = pl.BlockSpec((1, ctile), lambda ct, rb: (0, ct),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, ctile), lambda ct, rb: (rb, ct),
                            memory_space=pltpu.VMEM)
    flags, tn = pl.pallas_call(
        functools.partial(_sphere_flag_kernel, lanes=lanes),
        grid=grid,
        in_specs=[f_spec, p_spec, p_spec, p_spec, rl2_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rb_pad, C_pad), jnp.int32),
            jax.ShapeDtypeStruct((rb_pad, C_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(feats, planes[0], planes[1], planes[2], rl2)
    if with_tn:
        return flags[:rowblks] != 0, tn[:rowblks]
    return flags[:rowblks] != 0


def _work_list(flags, tn, w_max: int):
    """Compact bool [rows, C] flags into a ROW-MAJOR, NEAR-TO-FAR work list.

    ``tn`` f32 [rows, C]: conservative entry distance per (row group, unit)
    from the prepass.  Items of one row group are ordered by ascending tn,
    so the kernel visits a row's units front to back and can stop sweeping
    once every lane's best hit is closer than the next unit's entry (the
    termination test rides the returned ``tn_q`` thresholds).

    The sort rides ONE packed i32 key (notflag | row | top tn bits) plus the
    item-index payload — each extra 640k-lane sort column costs ~0.6 ms and
    this list is rebuilt for EVERY sweep (tools/sortbench.py), so the old
    4-operand form paid ~2x per prepass.  tn enters the key quantized to its
    top mantissa/exponent bits; the thresholds handed to the kernel are the
    DEQUANTIZED (rounded-down) values, which still lower-bound every true
    hit in the unit, so early termination stays conservative.

    Returns (work_row i32[w_max], work_sub i32[w_max], count i32[1],
    tn_q f32[w_max]).  Entries past ``count`` repeat entry 0 (no-DMA
    revisits, idempotent and scalar-skipped)."""
    rows, C = flags.shape
    w_max = min(w_max, rows * C)  # a small scene can't fill the budget
    flat = flags.reshape(-1)  # row-major
    idx = jnp.arange(rows * C, dtype=jnp.int32)
    row_bits = max((rows - 1).bit_length(), 1)
    tn_bits = 30 - row_bits  # notflag bit 30 keeps the key non-negative
    # tn >= 0 always (prepass clamps), so its f32 bit pattern is a
    # non-negative int that orders like the float; keep the top bits
    tnb = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(tn.reshape(-1), jnp.int32),
        31 - tn_bits,
    )
    key = (
        (jnp.logical_not(flat).astype(jnp.int32) << 30)
        | ((idx // C) << tn_bits)
        | tnb
    )
    s = jax.lax.sort((key, idx), num_keys=1)
    order = s[1][:w_max]
    tn_q = jax.lax.bitcast_convert_type(
        (s[0][:w_max] & ((1 << tn_bits) - 1)) << (31 - tn_bits),
        jnp.float32,
    )
    count = jnp.sum(flat.astype(jnp.int32))
    valid = jnp.arange(w_max, dtype=jnp.int32) < count
    sub = (order % C).astype(jnp.int32)
    row = (order // C).astype(jnp.int32)
    sub = jnp.where(valid, sub, sub[0])
    row = jnp.where(valid, row, row[0])
    tn_q = jnp.where(valid, tn_q, tn_q[0])
    return row, sub, count.reshape(1), tn_q


def _plucker_compact_kernel(
    packed_ref, count_ref, tnq_ref,  # scalar prefetch: i32 [W], [1], f32 [W]
    *refs,  # fan c_refs [1,g,4*F,K], fan f_refs [K,group*128], then outputs
    bf16x3: bool, group: int, g: int, unit_bits: int, fan: int = 1,
):
    """``fan`` work items per grid step: each item k has its own coefficient
    and feature block (separate BlockSpecs index-mapped at w*fan+k), so one
    grid step performs ``fan`` MXU sweeps — amortizing the per-step pipeline
    bookkeeping that dominates at 64-tri cull units.

    Work-item words pack (row group << unit_bits | cull unit).  A unit is
    g consecutive fine 64-tri clusters (g == 1 up to _SPHERE_UNIT_MAX fine
    clusters — the sphere prepass flags at fine granularity directly).

    EARLY TERMINATION: the list arrives row-major and near-to-far
    (``_work_list``), and ``tnq_ref[item]`` lower-bounds any hit t in the
    item's unit for every lane of its row group.  The grid is sequential on
    one TensorCore, so the launch-resident ``dist_ref`` is up to date when
    an item is reached: once every lane's best hit is strictly closer than
    the unit's entry the whole sweep is skipped.  The 1e-4 relative margin
    covers the 64-ulp packed-key quantization of stored t (stored <= true
    t < stored * (1 + 2^-16)), so skips can never drop a true winner."""
    c_refs = refs[:fan]
    f_refs = refs[fan:2 * fan]
    prim_ref, dist_ref = refs[2 * fan], refs[2 * fan + 1]
    w = pl.program_id(0)
    F = CLUSTER_SUB
    umask = (1 << unit_bits) - 1

    @pl.when(w == 0)
    def _init():
        prim_ref[...] = jnp.full_like(prim_ref, NULL_PRIMITIVE)
        dist_ref[...] = jnp.full_like(dist_ref, FLT_MAX)

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=None if bf16x3 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    iota6 = jax.lax.broadcasted_iota(jnp.int32, (F, group * 128), 0)

    def _sweeps(k, p):
            for s in range(g):
                def _fine(k=k, s=s, p=p):
                    # ONE [4*F, K] @ [K, group*128] MXU op per fine cluster
                    q = dot(c_refs[k][0, s], f_refs[k][...])
                    det = q[0 * F:1 * F, :]
                    bx = q[1 * F:2 * F, :]
                    by = q[2 * F:3 * F, :]
                    td = q[3 * F:4 * F, :]

                    sd = det * det
                    bxd = bx * det
                    byd = by * det
                    v = jnp.minimum(bxd, byd)
                    v = jnp.minimum(v, sd - bxd - byd)
                    v = jnp.minimum(v, sd - PLUCKER_EPS2)
                    tdd = td * det
                    # u > 0 ⟺ valid (see the scan kernel's epilogue note)
                    u = jnp.minimum(v, tdd)
                    rs = jax.lax.rsqrt(sd)  # t = tdd/sd without the divide
                    tval = jnp.where(u >= 0.0, tdd * rs * rs, FLT_MAX)

                    # packed-key argmin: sublane id in the low 6 mantissa
                    # bits, one integer min-reduce (see the scan kernel)
                    kb = ~((1 << _key_bits(F)) - 1)
                    key = (
                        jax.lax.bitcast_convert_type(tval, jnp.int32) & kb
                    ) | iota6
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    tmin = jax.lax.bitcast_convert_type(
                        kmin & kb, jnp.float32
                    )
                    id_base = ((p & umask) * g + s) * F
                    # fold each 128-lane column slice into its output row
                    # (static unroll; a (1, group*128) -> (group, 128)
                    # reshape would be a lane relayout, slices are free)
                    for j in range(group):
                        col = slice(j * 128, (j + 1) * 128)
                        row = pl.ds((p >> unit_bits) * group + j, 1)
                        kj = kmin[:, col]
                        tj = tmin[:, col]
                        upd = (kj < _key_miss(F)) & (tj < dist_ref[row, :])
                        dist_ref[row, :] = jnp.where(upd, tj, dist_ref[row, :])
                        prim_ref[row, :] = jnp.where(
                            upd, (kj & ~kb) + id_base, prim_ref[row, :]
                        )

                _fine()

    for k in range(fan):
        item = w * fan + k

        @pl.when(item < count_ref[0])
        def _outer(k=k, item=item):
            p = packed_ref[item]
            cur = dist_ref[pl.ds((p >> unit_bits) * group, group), :]
            live = jnp.max(cur) * (1.0 + 1e-4) >= tnq_ref[item]
            pl.when(live)(lambda k=k, p=p: _sweeps(k, p))


def _plucker_compact_occl_kernel(
    packed_ref, count_ref, tnq_ref,  # scalar prefetch (tnq unused: any-hit)
    *refs,  # fan c_refs, fan f_refs, fan tm_refs, then occ_ref output
    bf16x3: bool, group: int, g: int, unit_bits: int, fan: int = 1,
):
    c_refs = refs[:fan]
    f_refs = refs[fan:2 * fan]
    tm_refs = refs[2 * fan:3 * fan]
    occ_ref = refs[3 * fan]  # [rows, 128] i32 FULL output, launch-resident
    w = pl.program_id(0)
    F = CLUSTER_SUB
    umask = (1 << unit_bits) - 1

    @pl.when(w == 0)
    def _init():
        occ_ref[...] = jnp.zeros_like(occ_ref)

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=None if bf16x3 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    def _sweeps(k, p):
            for s in range(g):
                def _fine(k=k, s=s, p=p):
                    q = dot(c_refs[k][0, s], f_refs[k][...])
                    det = q[0 * F:1 * F, :]
                    bx = q[1 * F:2 * F, :]
                    by = q[2 * F:3 * F, :]
                    td = q[3 * F:4 * F, :]

                    sd = det * det
                    bxd = bx * det
                    byd = by * det
                    v = jnp.minimum(bxd, byd)
                    v = jnp.minimum(v, sd - bxd - byd)
                    v = jnp.minimum(v, sd - PLUCKER_EPS2)
                    tdd = td * det
                    # folded range/validity min (see the scan occl kernel)
                    w2 = jnp.minimum(
                        jnp.minimum(v, tdd), tm_refs[k][...] * sd - tdd
                    )
                    wmax = jnp.max(w2, axis=0, keepdims=True)
                    any_hit = (wmax >= 0.0).astype(jnp.int32)
                    for j in range(group):
                        col = slice(j * 128, (j + 1) * 128)
                        row = pl.ds((p >> unit_bits) * group + j, 1)
                        occ_ref[row, :] = occ_ref[row, :] | any_hit[:, col]

                _fine()

    for k in range(fan):
        item = w * fan + k

        @pl.when(item < count_ref[0])
        def _work(k=k, item=item):
            p = packed_ref[item]
            # early out: once every lane of the row group is occluded
            # nothing in this (or any later) unit can change the answer
            cur = occ_ref[pl.ds((p >> unit_bits) * group, group), :]
            pl.when(jnp.min(cur) == 0)(lambda k=k, p=p: _sweeps(k, p))


def _pad_work(packed, fan: int):
    """Pad a work-list array to a multiple of ``fan`` (repeat entry 0:
    padded items are no-DMA revisits and scalar-skipped by the count
    guard)."""
    pad = -packed.shape[0] % fan
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(packed[0], (pad,))]
        )
    return packed


def _compact_pallas_call(kernel, w_max, g, kdim, rows, out_shapes,
                         unit_bits=8, group=1, with_tm=False,
                         interpret=False, fan=1):
    """Shared PrefetchScalarGridSpec plumbing for the compact kernels.

    Work items arrive as ONE packed scalar word
    (row group << unit_bits | cull unit), so the SMEM prefetch footprint is
    a single [W] i32 array (plus the count) — that is what bounds the work
    budget (~1 MB SMEM on v5e).  ``fan`` work items ride each grid step
    (item k of step w is work-list entry w*fan+k, with its own
    coefficient/feature BlockSpecs); callers pad the work lists to
    fan*steps entries and pass the coeff/feat (and tmrow) operands ``fan``
    times — the duplicates alias the same HBM buffers."""
    steps = -(-w_max // fan)
    umask = (1 << unit_bits) - 1
    c_specs = [
        pl.BlockSpec(
            (1, g, 4 * CLUSTER_SUB, kdim),
            (lambda w, pk, cnt, tnq, k=k: (pk[w * fan + k] & umask, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for k in range(fan)
    ]
    f_specs = [
        pl.BlockSpec(
            (kdim, group * 128),
            (lambda w, pk, cnt, tnq, k=k: (0, pk[w * fan + k] >> unit_bits)),
            memory_space=pltpu.VMEM,
        )
        for k in range(fan)
    ]
    tm_specs = [
        pl.BlockSpec(
            (1, group * 128),
            (lambda w, pk, cnt, tnq, k=k: (0, pk[w * fan + k] >> unit_bits)),
            memory_space=pltpu.VMEM,
        )
        for k in range(fan)
    ] if with_tm else []
    out_spec = pl.BlockSpec(
        (rows, 128), lambda w, pk, cnt, tnq: (0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[*c_specs, *f_specs, *tm_specs],
        out_specs=[out_spec] * len(out_shapes),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        interpret=interpret,
    )


def _compact_prepass(
    tri_packed, ray_o, ray_d, tri_order, cluster_bounds, tmax,
    bf16x3, work_per_row, group, feat_pad_value, interpret=False,
    coeffs_pre=None, center_pre=None,
):
    """Shared setup for both compact entry points: coefficient stacking,
    per-ray exact visit flags (slab test for small scenes, MXU sphere test
    at fine 64-tri granularity above _PER_RAY_PREPASS_MAX clusters),
    work-list compaction, and the ray-feature matrix."""
    n = ray_o.shape[0]
    num_tris = tri_packed.shape[0]
    if bf16x3 is None:
        bf16x3 = _auto_prec(num_tris)
    C_fine = cluster_bounds.shape[0]
    # the work unit stays ONE fine 64-tri cluster until _SPHERE_UNIT_MAX
    # fine clusters (~262k tris); only beyond that do g clusters merge
    # (the sphere prepass is exact per ray at any unit count — the cap
    # bounds its [rowblks, C_pad] flag matrix and the SMEM work budget).
    g = -(-C_fine // _SPHERE_UNIT_MAX)
    sub = CLUSTER_SUB * g
    use_sphere = C_fine > _PER_RAY_PREPASS_MAX
    cull_bounds = (cluster_bounds if g == 1
                   else _coarsen_bounds(cluster_bounds, g))
    C_units = cull_bounds.shape[0]
    # wide enough for the sphere prepass's padded flag width (<= next
    # multiple of its max 1024-cluster tile)
    unit_bits = max(8, (-(-C_units // 1024) * 1024 - 1).bit_length())
    if use_sphere:
        # fine-granularity units are a larger share of the scene per row;
        # give the list headroom so real scenes don't trip the dense
        # fallback (SMEM bounds packed at ~200k words)
        work_per_row = max(work_per_row, 40)
    t_pad = -(-num_tris // sub) * sub
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    rows = n_pad // 128

    pre = _take_pre_coeffs(coeffs_pre, center_pre, CLUSTER_SUB, t_pad,
                           _kdim(bf16x3), tri_order=tri_order)
    if pre is not None:
        coeffs, center = pre
    else:
        if tri_order is not None:
            tri_packed = tri_packed[tri_order]

        v0 = tri_packed[:, 0:3]
        center = jax.lax.stop_gradient(
            0.5 * (v0.min(axis=0) + v0.max(axis=0))
        )
        coeffs = _plucker_coeffs(
            tri_packed, center, jnp.arange(num_tris, dtype=jnp.int32)
        )[0:4]
        coeffs = jnp.pad(coeffs, ((0, 0), (0, t_pad - num_tris), (0, 0)))
        # stack planes per FINE cluster: [t_pad//F, 4*F, K]
        coeffs = _stack4(coeffs, CLUSTER_SUB, bf16x3)
    # group g fine blocks per cull unit so the kernel can matmul each fine
    # cluster separately: [units, g, 4*F, K]
    coeffs = coeffs.reshape(t_pad // sub, g, *coeffs.shape[1:])

    assert rows % group == 0  # RAY_BLOCK = 8 rows; group in {1, 2, 4, 8}
    rowblks = rows // group
    o_pad, d_pad, tm_pad = _pad_rays(ray_o, ray_d, tmax, n_pad)
    if use_sphere:
        flags, tn = _sphere_flags(cull_bounds, center, o_pad - center, d_pad,
                                  tm_pad, rowblks, lanes=group * 128,
                                  interpret=interpret, with_tn=True)
    else:
        flags, tn = _row_flags(cull_bounds, o_pad, d_pad, tm_pad, rowblks,
                               lanes=group * 128, with_tn=True)
    # SMEM holds 8 B per work item (packed word + tn threshold) out of the
    # ~1 MB scalar memory on v5e; cap the budget so every (group, wpr)
    # combination compiles — overflow just means earlier dense fallback
    w_max = min(rowblks * work_per_row, rowblks * C_units,
                _SMEM_WORK_BYTES // 8)
    wrow, wsub, count, tn_q = _work_list(flags, tn, w_max)
    packed = (wrow << unit_bits) | wsub

    o = ray_o - center
    m = jnp.cross(o, ray_d)
    feats = jnp.concatenate(
        [ray_d, m, o, jnp.ones_like(o[:, :1])], axis=1
    )  # [N, 10]
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)),
                    constant_values=feat_pad_value)
    feats = _split_feats(feats.T, bf16x3)  # [K, N_pad]

    return {
        "tri_packed": tri_packed, "bf16x3": bf16x3, "g": g,
        "unit_bits": unit_bits,
        "rows": rows, "n_pad": n_pad, "kdim": _kdim(bf16x3),
        "coeffs": coeffs, "feats": feats,
        "packed": packed, "count": count, "w_max": w_max, "tn_q": tn_q,
    }


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "bf16x3", "work_per_row", "group", "fan"),
)
def intersect_plucker_compact(
    tri_packed, ray_o, ray_d,
    tri_order=None, cluster_bounds=None, tmax=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, bf16x3: bool | None = None,
    work_per_row: int = 24, group: int = 2, fan: int = 1,
):
    """Closest hit via the compacted work-list MXU sweep.

    Semantics match :func:`intersect_plucker_pallas` (positional winner ids
    remapped through ``tri_order``; ``tmax = -inf`` lanes are dead).  Work
    items are (``group``·128-ray row group, 64-tri sub-cluster) pairs — one
    feature DMA + one MXU op each; larger groups amortize the ~0.45 us
    per-step pipeline cost over more lanes at the price of coarser culling,
    while ``fan`` packs that many items into each grid step (amortizing the
    same cost with NO cull loss — the items keep their own blocks).
    The global budget is ``work_per_row`` items per row group; if the
    prepass flags more pairs, the whole launch falls back to the scan
    kernel (lax.cond — both branches compiled, one executed).
    ``cluster_bounds`` is REQUIRED (the work list is the cull)."""
    assert cluster_bounds is not None, "compact path requires cluster bounds"
    n = ray_o.shape[0]
    if n > COMPACT_MAX_LANES:
        prims, dists = [], []
        for lo in range(0, n, COMPACT_MAX_LANES):
            hi = lo + COMPACT_MAX_LANES
            p, t = intersect_plucker_compact(
                tri_packed, ray_o[lo:hi], ray_d[lo:hi],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                tmax=None if tmax is None else tmax[lo:hi],
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, bf16x3=bf16x3,
                work_per_row=work_per_row, group=group, fan=fan,
            )
            prims.append(p)
            dists.append(t)
        return jnp.concatenate(prims), jnp.concatenate(dists)

    pp = _compact_prepass(
        tri_packed, ray_o, ray_d, tri_order, cluster_bounds, tmax,
        bf16x3, work_per_row, group, feat_pad_value=1.0,
        interpret=interpret, coeffs_pre=coeffs_pre, center_pre=center_pre,
    )
    tri_packed = pp["tri_packed"]
    bf16x3 = pp["bf16x3"]
    g = pp["g"]
    unit_bits = pp["unit_bits"]
    rows = pp["rows"]
    n_pad = pp["n_pad"]
    kdim = pp["kdim"]
    coeffs, feats = pp["coeffs"], pp["feats"]
    packed, count, w_max = pp["packed"], pp["count"], pp["w_max"]
    tn_q = pp["tn_q"]

    row_shape = (rows, 128)

    def compact(_):
        pk = _pad_work(packed, fan)
        tq = _pad_work(tn_q, fan)
        call = _compact_pallas_call(
            functools.partial(_plucker_compact_kernel, g=g,
                              bf16x3=bf16x3, group=group,
                              unit_bits=unit_bits, fan=fan),
            w_max, g, kdim, rows,
            out_shapes=[
                jax.ShapeDtypeStruct(row_shape, jnp.int32),
                jax.ShapeDtypeStruct(row_shape, jnp.float32),
            ],
            unit_bits=unit_bits, group=group,
            interpret=interpret, fan=fan,
        )
        return call(pk, count, tq, *([coeffs] * fan), *([feats] * fan))

    def dense(_):
        p, t = intersect_plucker_pallas(
            tri_packed, ray_o, ray_d,
            tri_order=None, cluster_bounds=cluster_bounds, tmax=tmax,
            coeffs_pre=coeffs_pre if tri_order is None else None,
            center_pre=center_pre,
            interpret=interpret, bf16x3=bf16x3,
        )
        return (
            jnp.pad(p, (0, n_pad - n), constant_values=NULL_PRIMITIVE)
            .reshape(rows, 128),
            jnp.pad(t, (0, n_pad - n), constant_values=FLT_MAX)
            .reshape(rows, 128),
        )

    prim, dist = jax.lax.cond(count[0] <= w_max, compact, dense, None)

    prim = prim.reshape(-1)[:n]
    dist = dist.reshape(-1)[:n]
    prim = jnp.where(dist < FLT_MAX, prim, NULL_PRIMITIVE)
    if tri_order is not None:
        prim = jnp.where(
            prim >= 0, tri_order[jnp.maximum(prim, 0)], NULL_PRIMITIVE
        )
    return prim, dist


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "bf16x3", "work_per_row", "group", "fan"),
)
def occlusion_plucker_compact(
    tri_packed, x, y,
    tri_order=None, cluster_bounds=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, bf16x3: bool | None = None,
    work_per_row: int = 24, group: int = 2, fan: int = 1,
):
    """Any-hit segment query via the compacted work-list sweep — twin of
    :func:`occlusion_plucker_pallas` (see intersect_plucker_compact for the
    group/budget/fan semantics)."""
    assert cluster_bounds is not None, "compact path requires cluster bounds"
    if x.shape[0] > COMPACT_MAX_LANES:
        return jnp.concatenate([
            occlusion_plucker_compact(
                tri_packed, x[lo:lo + COMPACT_MAX_LANES],
                y[lo:lo + COMPACT_MAX_LANES],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, bf16x3=bf16x3,
                work_per_row=work_per_row, group=group, fan=fan,
            )
            for lo in range(0, x.shape[0], COMPACT_MAX_LANES)
        ])
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    max_dist = dist - eps
    ray_o = x + dirn * 1e-5
    ray_d = dirn

    n = ray_o.shape[0]
    pp = _compact_prepass(
        tri_packed, ray_o, ray_d, tri_order, cluster_bounds, max_dist,
        bf16x3, work_per_row, group, feat_pad_value=0.0,
        interpret=interpret, coeffs_pre=coeffs_pre, center_pre=center_pre,
    )
    tri_packed = pp["tri_packed"]
    bf16x3 = pp["bf16x3"]
    g = pp["g"]
    unit_bits = pp["unit_bits"]
    rows = pp["rows"]
    n_pad = pp["n_pad"]
    kdim = pp["kdim"]
    coeffs, feats = pp["coeffs"], pp["feats"]
    packed, count, w_max = pp["packed"], pp["count"], pp["w_max"]
    tn_q = pp["tn_q"]
    tmrow = jnp.pad(max_dist, (0, n_pad - n), constant_values=-FLT_MAX)
    tmrow = tmrow[None, :]  # [1, N_pad] f32

    row_shape = (rows, 128)

    def compact(_):
        pk = _pad_work(packed, fan)
        tq = _pad_work(tn_q, fan)
        call = _compact_pallas_call(
            functools.partial(_plucker_compact_occl_kernel, g=g,
                              bf16x3=bf16x3, group=group,
                              unit_bits=unit_bits, fan=fan),
            w_max, g, kdim, rows,
            out_shapes=[jax.ShapeDtypeStruct(row_shape, jnp.int32)],
            unit_bits=unit_bits, group=group,
            with_tm=True,
            interpret=interpret, fan=fan,
        )
        return call(pk, count, tq,
                    *([coeffs] * fan), *([feats] * fan), *([tmrow] * fan))[0]

    def dense(_):
        occ = occlusion_plucker_pallas(
            tri_packed, x, y,
            tri_order=None, cluster_bounds=cluster_bounds,
            coeffs_pre=coeffs_pre if tri_order is None else None,
            center_pre=center_pre,
            interpret=interpret, bf16x3=bf16x3,
        )
        return jnp.pad(occ.astype(jnp.int32), (0, n_pad - n)).reshape(
            rows, 128
        )

    occ = jax.lax.cond(count[0] <= w_max, compact, dense, None)
    return occ.reshape(-1)[:n] != 0


# ---------------------------------------------------------------------------
# Quadratic-feature MXU intersector (round-2 redesign of the Plücker kernel)
# ---------------------------------------------------------------------------
#
# Multiplying Möller–Trumbore's decision quantities through by det makes every
# one of them a QUADRATIC form in the 10 linear ray features (d, m=o×d, o, 1):
#
#   q1 = bx·det                >= 0   (barycentric u >= 0)
#   q2 = by·det                >= 0   (barycentric v >= 0)
#   q3 = det² − (bx+by)·det    >= 0   (u + v <= 1)
#   q4 = det² − eps²·|d|²      >= 0   (|det| >= eps, scale-free)
#   q5 = td·det                >  0   (t > 0);  t = q5 / det²
#   q6 = det² − td·det         >  0   (t < 1, occlusion segments only)
#
# Only 27 monomials appear (dd-sym 6, m⊗d 9, o⊗d 9, d 3), so ONE
# [5·sub, 27] @ [27, 128] MXU matmul per (cluster, 128 rays) yields all five
# decision planes directly and the VPU epilogue collapses to a min-chain +
# one compare (+ the t division and winner bookkeeping for closest hit):
# ~12 ops/pair closest / ~7 ops/pair any-hit, vs ~20 / ~11 for the linear
# Plücker kernel above — the sweep is epilogue-bound, so this is ~1.6x.
#
# Winner selection uses a BITCAST KEY: positive f32 order == int32 order, so
# packing the sublane index into the low 6 mantissa bits of t gives argmin
# via one integer min-reduce (dist is quantized by ≤64 ulp ≈ 2^-17 relative,
# far inside the f32 noise of the intersection itself).  Triangle ids are
# POSITIONAL (chunk base + sublane): the scene is stored pre-permuted in BVH
# leaf order (scene/build.py), so no id matmul and no unpermute gather.

# Precision scheme: Mosaic's f32 matmul ("HIGHEST") costs ~6 bf16 MXU passes
# and measured ~2x the wall-clock of single-pass bf16 — but the matmul OP
# overhead dominates flops here, so instead of separate passes the bf16x3
# product (hi·hi + hi·lo + lo·hi after splitting each f32 into two bf16s,
# ~17-bit effective mantissa) is folded into the K DIMENSION of one matmul:
#   q = [Chi | Chi | Clo] @ [Ghi; Glo; Ghi]       (K: 28 -> 84, pad 96)
# and all decision planes stack into the M dimension:
#   [5·sub, 96] @ [96, 128]  — ONE MXU op per (cluster, 128 rays).
# Decision-boundary noise ~1e-5 of the largest term (vs ~4e-3 raw bf16,
# ~1e-7 f32) — inside the f32 cancellation noise of the quadratic form
# itself, and far below anything visible in a Monte Carlo render.

QUAD_FEATS = 28  # 27 used + 1 pad ([27] is a constant-1 slot, currently 0-coef)
QUAD_K = QUAD_FEATS
_KEY_MISS = 0x7F7FFFC0  # bitcast(FLT_MAX) & ~63: "no hit in this cluster"


def _key_bits(sub: int) -> int:
    """Low mantissa bits of the packed winner key that carry the sublane
    index (CLUSTER_SUB may be retuned above 64 — tools/subsweep probes)."""
    return max(6, (sub - 1).bit_length())


def _key_miss(sub: int) -> int:
    return 0x7F7FFFFF & ~((1 << _key_bits(sub)) - 1)


# NOTE on precision (measured, round 2): a bf16x3 emulation (split f32 into
# hi/lo bf16, K-stack the three cross-products) runs ~2x faster but the
# quadratic form SQUARES MT's condition number — moderately grazing hits
# (det ~ 3e-3·|a||d|) land inside the 2^-17 product-noise band and get lost
# entirely.  The planes must be f32; the matmul op overhead is amortized by
# stacking all G decision planes into the M dimension instead (one
# [G*sub, 28] @ [28, 128] HIGHEST op per cluster).


QUAD_K_X6 = 176  # 6 x 28 product terms + 8 zero rows (bf16 tile alignment)


def _quad_kdim(prec: str) -> int:
    return QUAD_K if prec == "f32" else QUAD_K_X6


def _stack_coeffs(coeffs, sub: int, prec: str = "f32"):
    """[G, T, 28] f32 -> [T//sub, G*sub, 28|176]: all G decision planes of
    one cluster stacked into the matmul M dimension; for prec="x6" the
    3-way bf16 split's 6 product terms stack into K (see _stack4)."""
    g, t, k = coeffs.shape
    ck = coeffs.reshape(g, t // sub, sub, k)
    ck = ck.transpose(1, 0, 2, 3).reshape(t // sub, g * sub, k)
    if prec == "f32":
        return ck
    c0, c1, c2 = _split3(ck)
    z = jnp.zeros_like(c0[..., :8])
    return jnp.concatenate([c0, c0, c1, c0, c1, c2, z], axis=-1)


def _stack_feats(feats, prec: str = "f32"):
    """[N, 28] f32 features -> transposed (and K-split for x6) matrix."""
    if prec == "f32":
        return feats.T
    f0, f1, f2 = _split3(feats.T)
    z = jnp.zeros_like(f0[:8])
    return jnp.concatenate([f0, f1, f0, f2, f1, f0, z], axis=0)


def _quad_features(ray_o, ray_d, center):
    """Per-ray quadratic monomial features [N, 28] (see layout above)."""
    o = ray_o - center
    d = ray_d
    mm = jnp.cross(o, d)
    dd = jnp.stack(
        [
            d[:, 0] * d[:, 0], d[:, 1] * d[:, 1], d[:, 2] * d[:, 2],
            d[:, 0] * d[:, 1], d[:, 0] * d[:, 2], d[:, 1] * d[:, 2],
        ],
        axis=-1,
    )
    md = (mm[:, :, None] * d[:, None, :]).reshape(-1, 9)
    od = (o[:, :, None] * d[:, None, :]).reshape(-1, 9)
    return jnp.concatenate(
        [dd, md, od, d, jnp.ones_like(d[:, :1])], axis=1
    )  # [N, 28]


def _sym_dd(u, a):
    """Coefficient row of (u·d)(a·d) in the dd-sym feature layout."""
    return jnp.stack(
        [
            u[:, 0] * a[:, 0], u[:, 1] * a[:, 1], u[:, 2] * a[:, 2],
            u[:, 0] * a[:, 1] + u[:, 1] * a[:, 0],
            u[:, 0] * a[:, 2] + u[:, 2] * a[:, 0],
            u[:, 1] * a[:, 2] + u[:, 2] * a[:, 1],
        ],
        axis=-1,
    )  # [T, 6]


def _outer9(u, a):
    return (u[:, :, None] * a[:, None, :]).reshape(-1, 9)


def _quad_coeffs(tri_packed, center, with_q6: bool = False):
    """Per-triangle quadratic coefficient rows [5(or 6), T, 28]."""
    v0 = tri_packed[:, 0:3] - center
    e1 = tri_packed[:, 3:6]
    e2 = tri_packed[:, 6:9]
    a = jnp.cross(e2, e1)  # det = a·d
    b_d = -jnp.cross(e2, v0)  # bx = b_d·d + e2·m
    b_m = e2
    y_d = jnp.cross(e1, v0)  # by = y_d·d − e1·m
    y_m = -e1
    n = jnp.cross(e1, e2)  # td = n·o − v0·n
    t_c = -jnp.sum(v0 * n, axis=1, keepdims=True)

    z6 = jnp.zeros((tri_packed.shape[0], 6), tri_packed.dtype)
    z9 = jnp.zeros((tri_packed.shape[0], 9), tri_packed.dtype)
    z3 = jnp.zeros((tri_packed.shape[0], 3), tri_packed.dtype)
    z1 = z3[:, :1]

    def row(dd, md, od, dl):
        return jnp.concatenate([dd, md, od, dl, z1], axis=1)

    det2 = _sym_dd(a, a)
    eps_dd = jnp.zeros((1, 6), tri_packed.dtype).at[0, 0:3].set(PLUCKER_EPS2)
    q1 = row(_sym_dd(b_d, a), _outer9(b_m, a), z9, z3)
    q2 = row(_sym_dd(y_d, a), _outer9(y_m, a), z9, z3)
    q3 = row(det2 - _sym_dd(b_d + y_d, a), -_outer9(b_m + y_m, a), z9, z3)
    q4 = row(det2 - eps_dd, z9, z9, z3)
    q5 = row(z6, z9, _outer9(n, a), t_c * a)
    rows = [q1, q2, q3, q4, q5]
    if with_q6:
        rows.append(row(det2, z9, -_outer9(n, a), -t_c * a))
    return jnp.stack(rows, axis=0)  # [5 or 6, T, 28]


def _quad_kernel(
    mask_ref,  # SMEM i32 [1, ROWS, n_chunks]
    c_ref,  # [subs_per_chunk, 5*sub, 28] VMEM f32 stacked coefficients
    f_ref,  # [28, RAY_BLOCK] VMEM f32 ray features
    prim_ref, dist_ref,  # outputs [RAY_BLOCK//128, 128]
    prim_s, dist_s,  # VMEM scratch [n_pad//128, 128], persists across grid
    *, tri_chunk: int, n_chunks: int, sub: int, use_mask: bool,
    prec: str = "f32",
):
    c = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)

    @pl.when(c == 0)
    def _init():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_s[blk, :] = jnp.full(
            (RAY_BLOCK // 128, 128), NULL_PRIMITIVE, jnp.int32
        )
        dist_s[blk, :] = jnp.full((RAY_BLOCK // 128, 128), FLT_MAX, jnp.float32)

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST if prec == "f32" else None,
        preferred_element_type=jnp.float32,
    )
    iota6 = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)

    def _step_body():
        for s in range(tri_chunk // sub):
            for r in range(RAY_BLOCK // 128):
                def _sweep(s=s, r=r):
                    f = f_ref[:, r * 128:(r + 1) * 128]  # [kdim, 128]
                    q = dot(c_ref[s], f)  # ONE [5*sub,kdim]@[kdim,128] MXU op
                    q1 = q[0 * sub:1 * sub, :]
                    q2 = q[1 * sub:2 * sub, :]
                    q3 = q[2 * sub:3 * sub, :]
                    q4 = q[3 * sub:4 * sub, :]
                    q5 = q[4 * sub:5 * sub, :]

                    mmin = jnp.minimum(
                        jnp.minimum(q1, q2), jnp.minimum(q3, q4)
                    )
                    mmin = jnp.minimum(mmin, q5)
                    # closest-hit rays are unit-length: |d|²==1, sd = q4+eps²
                    # (rsqrt replaces the divide — the single most expensive
                    # epilogue op; q4+eps² == det² >= 0 for unit d)
                    rs = jax.lax.rsqrt(q4 + PLUCKER_EPS2)
                    t = q5 * rs * rs
                    tval = jnp.where(mmin >= 0.0, t, FLT_MAX)
                    kb = ~((1 << _key_bits(sub)) - 1)
                    key = (
                        jax.lax.bitcast_convert_type(tval, jnp.int32) & kb
                    ) | iota6
                    kmin = jnp.min(key, axis=0, keepdims=True)  # [1, 128]

                    row = pl.ds(base + r, 1)
                    tq = jax.lax.bitcast_convert_type(kmin & kb, jnp.float32)
                    prim_new = (c * tri_chunk + s * sub) + (kmin & ~kb)
                    upd = (kmin < _key_miss(sub)) & (tq < dist_s[row, :])
                    dist_s[row, :] = jnp.where(upd, tq, dist_s[row, :])
                    prim_s[row, :] = jnp.where(upd, prim_new, prim_s[row, :])

                if use_mask:
                    pl.when((mask_ref[0, r, c] >> s) & 1 != 0)(_sweep)
                else:
                    _sweep()

    if use_mask:
        # step-level union guard (see _plucker_kernel)
        union = mask_ref[0, 0, c]
        for r in range(1, RAY_BLOCK // 128):
            union = union | mask_ref[0, r, c]
        pl.when(union != 0)(_step_body)
    else:
        _step_body()

    @pl.when(c == n_chunks - 1)
    def _flush():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_ref[:] = prim_s[blk, :]
        dist_ref[:] = dist_s[blk, :]


def _quad_occl_kernel(
    mask_ref,  # SMEM i32 [1, ROWS, n_chunks]
    c_ref,  # [subs_per_chunk, 6*sub, 28] VMEM f32 stacked coefficients
    f_ref,  # [28, RAY_BLOCK] VMEM f32 SEGMENT features (unnormalized)
    occ_ref,  # output [RAY_BLOCK//128, 128] i32 (0/1)
    occ_s,  # VMEM scratch [n_pad//128, 128] i32
    *, tri_chunk: int, n_chunks: int, sub: int, use_mask: bool,
    prec: str = "f32", early_exit: bool = False,
):
    """Any-hit over unit-parameter SEGMENTS: rays carry d = y−x unnormalized,
    so the in-range test t∈(0,1) is two more quadratic planes (q5, q6) and
    the epilogue is a pure 6-way min + compare (~7 ops/pair)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)

    @pl.when(c == 0)
    def _init():
        occ_s[pl.ds(base, RAY_BLOCK // 128), :] = jnp.zeros(
            (RAY_BLOCK // 128, 128), jnp.int32
        )

    dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST if prec == "f32" else None,
        preferred_element_type=jnp.float32,
    )

    def _step_body():
        # any-hit early exit, as in _plucker_occl_kernel: a fully occluded
        # row skips its remaining sub-sweeps (conservatively stale within
        # a grid step); statically gated by scene size (see the scan twin)
        if early_exit:
            row_done = [
                jnp.min(occ_s[pl.ds(base + r, 1), :]) > 0
                for r in range(RAY_BLOCK // 128)
            ]
        else:
            row_done = [False] * (RAY_BLOCK // 128)
        for s in range(tri_chunk // sub):
            for r in range(RAY_BLOCK // 128):
                def _sweep(s=s, r=r):
                    f = f_ref[:, r * 128:(r + 1) * 128]  # [28, 128]
                    q = dot(c_ref[s], f)  # ONE [6*sub,28]@[28,128] f32 MXU op
                    q1 = q[0 * sub:1 * sub, :]
                    q2 = q[1 * sub:2 * sub, :]
                    q3 = q[2 * sub:3 * sub, :]
                    q4 = q[3 * sub:4 * sub, :]
                    q5 = q[4 * sub:5 * sub, :]
                    q6 = q[5 * sub:6 * sub, :]

                    mmin = jnp.minimum(
                        jnp.minimum(q1, q2), jnp.minimum(q3, q4)
                    )
                    mmin = jnp.minimum(mmin, jnp.minimum(q5, q6))
                    # reduce FIRST, compare once per row (saves the
                    # per-pair compare + int cast)
                    wmax = jnp.max(mmin, axis=0, keepdims=True)
                    row = pl.ds(base + r, 1)
                    occ_s[row, :] = occ_s[row, :] | (wmax >= 0.0).astype(
                        jnp.int32
                    )

                if use_mask and early_exit:
                    pl.when(
                        ((mask_ref[0, r, c] >> s) & 1 != 0)
                        & jnp.logical_not(row_done[r])
                    )(_sweep)
                elif use_mask:
                    pl.when((mask_ref[0, r, c] >> s) & 1 != 0)(_sweep)
                elif early_exit:
                    pl.when(jnp.logical_not(row_done[r]))(_sweep)
                else:
                    _sweep()

    if use_mask:
        # step-level union guard (see _plucker_kernel)
        union = mask_ref[0, 0, c]
        for r in range(1, RAY_BLOCK // 128):
            union = union | mask_ref[0, r, c]
        pl.when(union != 0)(_step_body)
    else:
        _step_body()

    @pl.when(c == n_chunks - 1)
    def _flush():
        occ_ref[:] = occ_s[pl.ds(base, RAY_BLOCK // 128), :]


# VMEM scratch is sized to the WHOLE padded wavefront (8 B/lane closest-hit);
# cap lanes per pallas_call and sweep oversized wavefronts in sub-launches so
# 1080p+ resolutions cannot blow the ~16 MB VMEM budget (ADVICE round 1).
MAX_LANES_PER_LAUNCH = 1 << 20


def cluster_sub_for(num_tris: int) -> int:
    """Per-scene culling-cluster size for the SCAN-tier engines.

    Swept on-chip (rounds 3-4, tools/cluster_sweep.py, 800^2 depth-5
    frames, compact bounce loop): cluster size trades per-op fixed cost
    (grid steps, branches, M-stream latency) against row-union pair
    waste.  Round-4 winners: teapot(4.9k) 123 ms @128 vs 128 @64 / 156
    @256; glass(7.9k) 178 @64 vs 188 @128; teapot_hires(112k) 502 @512
    vs 530 @256.  Pinned: 128 up to ~6k tris, 64 for mid scenes, 512 for
    big scan-tier scenes; RADISH_CLUSTER_SUB overrides (the compact/band
    engines keep the fixed 64-tri granularity their SMEM mask/work-list
    formats assume)."""
    env = os.environ.get("RADISH_CLUSTER_SUB")
    if env:
        return int(env)
    if BIG_SCENE_TRIS < num_tris <= PALLAS_MXU_MAX_TRIS:
        return 512
    if num_tris <= 6144:
        return 128
    return CLUSTER_SUB


def _chunking(num_tris: int, cluster_sub: int | None = None):
    """(sub, tri_chunk, t_pad) for the scan kernels' (chunk, block) grid.

    Big scenes double the chunk: the grid-step pipeline cost (~0.26 us) at
    111k tris is 218 x 625 = 136k steps — TRI_CHUNK=1024 measured 28%/10%
    faster primary/bounce sweeps at teapot_hires with exact winner parity,
    while 2048 (a 128-wide pl.when nest per step) collapsed 3-4x (icache)
    and mid scenes are insensitive (±3%; tools/ab_chunk.py).

    ``cluster_sub`` overrides the 64-tri cull-cluster size (the scene build
    passes its per-scene choice, cluster_sub_for)."""
    csub = cluster_sub or CLUSTER_SUB
    if num_tris > csub:
        sub = csub
        chunk = TRI_CHUNK * 2 if num_tris > BIG_SCENE_TRIS else TRI_CHUNK
        chunk = max(sub, (chunk // sub) * sub)
        tri_chunk = min(chunk, -(-num_tris // sub) * sub)
    else:
        tri_chunk = -(-num_tris // TRI_SUB) * TRI_SUB
        sub = tri_chunk
    t_pad = -(-num_tris // tri_chunk) * tri_chunk
    return sub, tri_chunk, t_pad


def precompute_sweep_coeffs(tri_packed, tri_order=None, cluster_sub=None):
    """Build-time stacked Plücker decision planes + scene center.

    The coefficient prep (permute + 4 plane rows + pad + M-stack) costs
    ~5.5 ms per sweep at 111k tris — and a depth-5 frame runs it inside the
    bounce ``fori_loop`` ~11 times (XLA does not hoist loop-invariant code
    out of ``while``), wasting ~60 ms/frame.  Computing it ONCE at scene
    build and passing the arrays into the kernels removes that entirely.

    Returns (coeffs [t_pad//sub, 4*sub, 10|30], center f32[3]) in the exact
    layout :func:`intersect_plucker_pallas` / the occlusion twin expect for
    the build-time TRI_CHUNK; the kernels validate the shape and fall back
    to inline prep if a tool has since retuned the chunking.
    """
    num_tris = tri_packed.shape[0]
    if tri_order is not None:
        tri_packed = tri_packed[tri_order]
    bf16x3 = _auto_prec(num_tris)
    sub, _, t_pad = _chunking(num_tris, cluster_sub)
    v0 = tri_packed[:, 0:3]
    center = jax.lax.stop_gradient(0.5 * (v0.min(axis=0) + v0.max(axis=0)))
    coeffs = _plucker_coeffs(
        tri_packed, center, jnp.arange(num_tris, dtype=jnp.int32)
    )[0:4]
    coeffs = jnp.pad(coeffs, ((0, 0), (0, t_pad - num_tris), (0, 0)))
    return _stack4(coeffs, sub, bf16x3), center


def _take_pre_coeffs(coeffs_pre, center_pre, sub, t_pad, kdim,
                     tri_order=None):
    """Validate/slice precomputed sweep coefficients for this launch's
    chunking; None when unusable (caller falls back to inline prep).
    A larger stored t_pad is fine — trailing rows are all-zero padding.
    Precomputed coeffs are assumed to already include any spatial permute,
    so an explicit ``tri_order`` disables them (the caller would permute
    differently)."""
    if coeffs_pre is None or center_pre is None or tri_order is not None:
        return None
    rows = t_pad // sub
    if (
        coeffs_pre.ndim != 3
        or coeffs_pre.shape[0] < rows
        or coeffs_pre.shape[1] != 4 * sub
        or coeffs_pre.shape[2] != kdim
    ):
        return None
    return coeffs_pre[:rows], center_pre


def precompute_quad_coeffs(tri_packed, prec: str = "x6",
                           cluster_sub: int | None = None):
    """Build-time stacked quadratic decision planes (WITH the q6 range
    plane) + scene center for the quad engine — the inline prep otherwise
    reruns inside the bounce fori_loop (~20 ms/sweep at 111k tris).  The
    closest-hit entry slices the first 5 plane blocks per cluster
    (M-stacking puts plane g of a cluster at rows g*sub..(g+1)*sub)."""
    num_tris = tri_packed.shape[0]
    sub, _, t_pad = _chunking(num_tris, cluster_sub)
    v0 = tri_packed[:, 0:3]
    center = jax.lax.stop_gradient(0.5 * (v0.min(axis=0) + v0.max(axis=0)))
    # Pad with degenerate (all-zero) triangles BEFORE the coefficient build:
    # a zero tri has det == 0, so its q4 plane dots to -eps^2*|d|^2 < 0 and
    # the pad row can never win.  Zero-padding the coefficient rows instead
    # zeroes the eps plane too, and all q == 0 passes the inclusive >= 0
    # edge rule as a fake hit at t = 0.
    tri_pad = jnp.pad(tri_packed, ((0, t_pad - num_tris), (0, 0)))
    coeffs = _quad_coeffs(tri_pad, center, with_q6=True)
    return _stack_coeffs(coeffs, sub, prec), center


def _take_quad_pre(coeffs_pre, center_pre, sub, t_pad, kdim, planes,
                   tri_order=None):
    """Validate precomputed quad planes; slice to ``planes`` per cluster."""
    if coeffs_pre is None or center_pre is None or tri_order is not None:
        return None
    rows = t_pad // sub
    if (
        coeffs_pre.ndim != 3
        or coeffs_pre.shape[0] < rows
        or coeffs_pre.shape[1] != 6 * sub
        or coeffs_pre.shape[2] != kdim
    ):
        return None
    return coeffs_pre[:rows, :planes * sub, :], center_pre


@functools.partial(
    jax.jit, static_argnames=("interpret", "prec", "cluster_sub")
)
def intersect_quad_pallas(
    tri_packed, ray_o, ray_d,
    tri_order=None, cluster_bounds=None, tmax=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, prec: str = "x6",
    cluster_sub: int | None = None,
):
    """Closest hit via the quadratic-feature MXU kernel.

    Returns (prim i32[N], dist f32[N]).  ``prim`` is the POSITIONAL index
    into ``tri_packed`` (the device scene stores triangles pre-permuted in
    BVH leaf order, so positional == real); pass ``tri_order`` to map
    positions back through an explicit permutation (adds one gather).
    ``dist`` is quantized to 64 ulp (≈2^-17 relative) by the winner key.
    """
    n = ray_o.shape[0]
    num_tris = tri_packed.shape[0]
    sub, tri_chunk, t_pad = _chunking(num_tris, cluster_sub)
    n_chunks = t_pad // tri_chunk
    subs_per_chunk = tri_chunk // sub

    pre = _take_quad_pre(coeffs_pre, center_pre, sub, t_pad,
                         _quad_kdim(prec), planes=5, tri_order=tri_order)
    if pre is not None:
        coeffs, center = pre
    else:
        v0 = tri_packed[:, 0:3]
        center = jax.lax.stop_gradient(
            0.5 * (v0.min(axis=0) + v0.max(axis=0)))
        # degenerate-tri padding keeps the q4 eps plane negative on pad
        # rows (see precompute_quad_coeffs)
        tri_pad = jnp.pad(tri_packed, ((0, t_pad - num_tris), (0, 0)))
        coeffs = _quad_coeffs(tri_pad, center)
        coeffs = _stack_coeffs(coeffs, sub, prec)  # [t_pad//sub, 5*sub, k]

    prims = []
    dists = []
    for lo in range(0, n, MAX_LANES_PER_LAUNCH):
        o_i = ray_o[lo:lo + MAX_LANES_PER_LAUNCH]
        d_i = ray_d[lo:lo + MAX_LANES_PER_LAUNCH]
        t_i = tmax[lo:lo + MAX_LANES_PER_LAUNCH] if tmax is not None else None
        p_i, q_i = _quad_launch(
            coeffs, center, o_i, d_i, t_i, cluster_bounds,
            num_tris=num_tris, tri_chunk=tri_chunk, n_chunks=n_chunks,
            sub=sub, subs_per_chunk=subs_per_chunk, interpret=interpret,
            prec=prec,
        )
        prims.append(p_i)
        dists.append(q_i)
    prim = prims[0] if len(prims) == 1 else jnp.concatenate(prims)
    dist = dists[0] if len(dists) == 1 else jnp.concatenate(dists)
    prim = jnp.where((dist < FLT_MAX) & (prim < num_tris), prim, NULL_PRIMITIVE)
    if tri_order is not None:
        prim = jnp.where(prim >= 0, tri_order[jnp.maximum(prim, 0)], prim)
    return prim, dist


def _quad_launch(coeffs, center, ray_o, ray_d, tmax, cluster_bounds, *,
                 num_tris, tri_chunk, n_chunks, sub, subs_per_chunk,
                 interpret, prec="f32"):
    n = ray_o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    n_blocks = n_pad // RAY_BLOCK

    use_mask = cluster_bounds is not None
    if use_mask:
        mask = _cluster_mask_bits(
            cluster_bounds, ray_o, ray_d, tmax,
            n_blocks, n_chunks, subs_per_chunk,
        )
    else:
        mask = jnp.zeros((n_blocks, 1, 1), jnp.int32)

    feats = _quad_features(ray_o, ray_d, center)  # [N, 28]
    # padding rays: all-zero features -> every q == 0 -> never valid
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)))
    feats = _stack_feats(feats, prec)  # [kdim, N_pad]

    kdim = _quad_kdim(prec)
    grid = (n_chunks, n_blocks)
    mask_spec = pl.BlockSpec(
        (1,) + mask.shape[1:], lambda c, i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )
    c_spec = pl.BlockSpec(
        (subs_per_chunk, 5 * sub, kdim), lambda c, i: (c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    f_spec = pl.BlockSpec(
        (kdim, RAY_BLOCK), lambda c, i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda c, i: (i, 0), memory_space=pltpu.VMEM
    )
    row_shape = (n_pad // 128, 128)
    prim, dist = pl.pallas_call(
        functools.partial(
            _quad_kernel, tri_chunk=tri_chunk, n_chunks=n_chunks,
            sub=sub, use_mask=use_mask, prec=prec,
        ),
        grid=grid,
        in_specs=[mask_spec, c_spec, f_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(row_shape, jnp.int32),
            jax.ShapeDtypeStruct(row_shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(row_shape, jnp.int32),
            pltpu.VMEM(row_shape, jnp.float32),
        ],
        interpret=interpret,
    )(mask, coeffs, feats)
    return prim.reshape(-1)[:n], dist.reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("interpret", "prec", "cluster_sub")
)
def occlusion_quad_pallas(tri_packed, x, y,
                          tri_order=None, cluster_bounds=None,
                          coeffs_pre=None, center_pre=None,
                          interpret: bool = False, prec: str = "x6",
                          cluster_sub: int | None = None):
    """Shadow query via the quadratic any-hit kernel over unit-parameter
    segments (epsilon-inset exactly like occlusion_brute: origin advanced
    1e-5, endpoint pulled back 1e-4 along the normalized direction)."""
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    ray_o = x + dirn * 1e-5
    seg = dirn * (dist - eps - 1e-5)[..., None]  # unnormalized, t in (0,1)

    n = x.shape[0]
    num_tris = tri_packed.shape[0]
    sub, tri_chunk, t_pad = _chunking(num_tris, cluster_sub)
    n_chunks = t_pad // tri_chunk
    subs_per_chunk = tri_chunk // sub

    pre = _take_quad_pre(coeffs_pre, center_pre, sub, t_pad,
                         _quad_kdim(prec), planes=6, tri_order=tri_order)
    if pre is not None:
        coeffs, center = pre
    else:
        v0 = tri_packed[:, 0:3]
        center = jax.lax.stop_gradient(
            0.5 * (v0.min(axis=0) + v0.max(axis=0)))
        # degenerate-tri padding keeps the q4 eps plane negative on pad
        # rows (see precompute_quad_coeffs)
        tri_pad = jnp.pad(tri_packed, ((0, t_pad - num_tris), (0, 0)))
        coeffs = _quad_coeffs(tri_pad, center, with_q6=True)
        coeffs = _stack_coeffs(coeffs, sub, prec)  # [t_pad//sub, 6*sub, k]

    outs = []
    for lo in range(0, n, MAX_LANES_PER_LAUNCH):
        outs.append(_quad_occl_launch(
            coeffs, center, ray_o[lo:lo + MAX_LANES_PER_LAUNCH],
            seg[lo:lo + MAX_LANES_PER_LAUNCH], cluster_bounds,
            tri_chunk=tri_chunk, n_chunks=n_chunks, sub=sub,
            subs_per_chunk=subs_per_chunk, interpret=interpret, prec=prec,
        ))
    occ = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return occ != 0


def _quad_occl_launch(coeffs, center, ray_o, seg, cluster_bounds, *,
                      tri_chunk, n_chunks, sub, subs_per_chunk, interpret,
                      prec="f32"):
    n = ray_o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    n_blocks = n_pad // RAY_BLOCK

    use_mask = cluster_bounds is not None
    if use_mask:
        # slab distances over the unnormalized segment are in fractions of
        # the segment: tmax = 1 bounds the prepass at the light
        mask = _cluster_mask_bits(
            cluster_bounds, ray_o, seg, jnp.ones(n, jnp.float32),
            n_blocks, n_chunks, subs_per_chunk,
        )
    else:
        mask = jnp.zeros((n_blocks, 1, 1), jnp.int32)

    feats = _quad_features(ray_o, seg, center)
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)))
    feats = _stack_feats(feats, prec)  # [kdim, N_pad]

    kdim = _quad_kdim(prec)
    grid = (n_chunks, n_blocks)
    mask_spec = pl.BlockSpec(
        (1,) + mask.shape[1:], lambda c, i: (i, 0, 0),
        memory_space=pltpu.SMEM,
    )
    c_spec = pl.BlockSpec(
        (subs_per_chunk, 6 * sub, kdim), lambda c, i: (c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    f_spec = pl.BlockSpec(
        (kdim, RAY_BLOCK), lambda c, i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda c, i: (i, 0), memory_space=pltpu.VMEM
    )
    row_shape = (n_pad // 128, 128)
    occ = pl.pallas_call(
        functools.partial(
            _quad_occl_kernel, tri_chunk=tri_chunk, n_chunks=n_chunks,
            sub=sub, use_mask=use_mask, prec=prec,
            early_exit=n_chunks * tri_chunk >= OCCL_EARLY_EXIT_MIN_TRIS,
        ),
        grid=grid,
        in_specs=[mask_spec, c_spec, f_spec],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct(row_shape, jnp.int32)],
        scratch_shapes=[pltpu.VMEM(row_shape, jnp.int32)],
        interpret=interpret,
    )(mask, coeffs, feats)[0]
    return occ.reshape(-1)[:n]

# ---------------------------------------------------------------------------
# Banded pass-resident intersector (round 3)
# ---------------------------------------------------------------------------
#
# The scan kernels above cull at (128-lane row) x (64-tri cluster)
# granularity, and at big-scene bounces the ROW UNION is tail-driven: per-ray
# fine-cluster flags are p50=1 while the 128-lane union is ~84-97
# (BASELINE.md round-2 extended session; tools/band_stats.py).  Splitting
# each row into G BANDS of 128/G lanes and sweeping ONE cluster PER BAND per
# MXU op drops the per-row sweep count from |union(128 lanes)| to
# max_b |union(band b)| — measured 97 -> 41 (G=8) / 31 (G=16) on
# teapot_hires bounce-1 wavefronts with the count-segregating sort.
#
# Critically, the win only materializes if each band walks its own GLOBAL
# cluster list: restricting a sweep's G clusters to a small shared window
# (e.g. one 16-cluster chunk) re-fragments the schedule and erases the gain
# (measured: window 8 -> j 82 vs unbounded 31; BASELINE.md round 3).  So this
# engine splits the scene into P PASSES sized to VMEM (~6 MB of transposed
# coefficients each, single-buffered via an explicit DMA) and, within a
# pass, every band advances through its own bitmask independently:
#
# * coefficients live as [Cp, 16, 256] per pass: cluster c's block is the
#   TRANSPOSED plane matrix (K on sublanes, padded 10->16 so in-kernel
#   concatenation writes at 16-aligned sublane offsets), M = 4 planes x 64
#   triangles on lanes;
# * per work item the kernel concatenates the G scheduled clusters'
#   [16, 256] blocks into a [G*16, 256] scratch (dynamic first-dim reads,
#   static aligned destinations — a few vector ops per band, NOT the
#   ~32-op lane-relayout a [256, K]-major concat would cost);
# * the feature matrix is BAND-STATIC: F_big[16*b + k, lane] =
#   f[k, lane] * [lane in band b], built once per (row, pass) — the
#   schedule never touches it;
# * one dot_general contracting the leading dim
#   ([G*16, 256]^T . [G*16, 128] -> [256, 128]) evaluates every lane
#   against exactly its band's scheduled cluster; the epilogue is the
#   standard packed-key argmin with a PER-LANE id base (S*64).
#
# Schedules are extracted in-kernel from per-(row, band, pass) 16-bit-word
# SMEM bitmasks: each band keeps (word index, current word) scalar state,
# refills from the next nonzero word when empty, and yields its lowest set
# bit per item (branchless 4-level ctz — Mosaic has no scalar bitcast or
# ctz).  No XLA-side schedule arrays, sorts, or gathers are needed.

BAND_TUNING = {"G": 8}  # bands per 128-lane row; trace-time (CLI --band-g)
BAND_KPAD = 16  # per-cluster K rows (10 used, padded for aligned concat)
# pass size: clusters per pass chosen so the single-buffered coefficient
# block stays near this budget (VMEM is ~16 MB; hit-state scratch and the
# wavefront feature block need the rest)
BAND_PASS_BYTES = 6 << 20
# scene-size threshold for auto-selecting the banded engine: below it the
# 128-lane row union is already within ~1.5x of the per-ray floor
# (teapot 12.4 vs 8.4) and the banded per-sweep overhead is a net loss
BAND_MIN_TRIS = 32768
# the hit-state scratch is 8 B/lane and the pass table is single-buffered;
# cap lanes per launch so both fit VMEM together
BAND_MAX_LANES = 640 * 1024


def _band_pass_split(C: int):
    """(P, Cp, words): passes, clusters per pass, 16-bit words per pass."""
    per_cluster = BAND_KPAD * 4 * CLUSTER_SUB * 4  # bytes
    cp_max = max(2, BAND_PASS_BYTES // per_cluster)
    P = -(-C // cp_max)
    Cp = -(-C // P)
    Cp = -(-Cp // 16) * 16  # whole 16-bit words
    P = -(-C // Cp)
    return P, Cp, Cp // 16


def _band_mask_bits(cluster_bounds, ray_o, ray_d, tmax, n_blocks,
                    P: int, Cp: int, G: int):
    """Visit bitmasks for the banded kernel: i32
    [n_blocks, 8, G, P, Cp//16] (16 valid bits per word, bit k of word w =
    local cluster w*16+k) plus the per-(row, pass) union
    [n_blocks, 8, P] for the row guard."""
    n_pad = n_blocks * RAY_BLOCK
    o, d, tm = _pad_rays(ray_o, ray_d, tmax, n_pad)
    C = cluster_bounds.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tn = jnp.full((n_pad, C), -FLT_MAX)
    tf = jnp.full((n_pad, C), FLT_MAX)
    for k in range(3):
        a = (cluster_bounds[None, :, k] - o[:, k, None]) * inv[:, k, None]
        b = (cluster_bounds[None, :, 3 + k] - o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < tm[:, None])  # [n_pad, C]
    lanes = 128 // G
    groups = n_pad // lanes
    hit = hit.reshape(groups, lanes, C).any(axis=1)  # [groups, C]
    hit = jnp.pad(hit, ((0, 0), (0, P * Cp - C)))
    bits = hit.reshape(groups, P, Cp // 16, 16).astype(jnp.int32)
    weights = (1 << jnp.arange(16, dtype=jnp.int32))[None, None, None]
    packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.int32)
    # SMEM block shapes must keep the sliced PASS axis out of the last two
    # dims (Mosaic requires those to equal the array dims or tile to (8,128))
    packed = packed.reshape(n_blocks, RAY_BLOCK // 128, G, P, Cp // 16)
    packed = packed.transpose(0, 3, 1, 2, 4)  # [blocks, P, 8, G, words]
    union = (packed != 0).any(axis=(3, 4))  # [blocks, P, 8]
    union = union.astype(jnp.int32)[:, :, None, :]  # [blocks, P, 1, 8]
    return packed, union


def _scalar_lsb_index(m):
    """Index of the lowest set bit of a scalar i32 (valid bits < 16), by
    branchless binary search on the isolated lsb (Mosaic has no scalar
    bitcast, so the f32-exponent trick is off the table); returns -1 when
    m == 0 (a sentinel that can never match a cluster index)."""
    lsb = m & (0 - m)
    i32 = jnp.int32
    s = (
        ((lsb & 0xAAAA) != 0).astype(i32)
        | (((lsb & 0xCCCC) != 0).astype(i32) << 1)
        | (((lsb & 0xF0F0) != 0).astype(i32) << 2)
        | (((lsb & 0xFF00) != 0).astype(i32) << 3)
    )
    return jnp.where(m != 0, s, -1)


def _band_sweep_loop(mask_ref, r, c_tab, cat_s, f_big, words: int, G: int,
                     do_sweep):
    """The per-row banded schedule walk (shared by closest-hit/any-hit).

    Each band b keeps scalar state (w_b, m_b): the next mask word index and
    the current word's remaining bits.  Per iteration every non-exhausted
    band refills from its next nonzero word if needed, yields its lowest
    set bit as the scheduled LOCAL cluster, the G blocks are concatenated
    into ``cat_s`` ([G*16, 256] scratch), and ``do_sweep(q, S)`` consumes
    the [256, 128] plane values + per-lane local cluster ids.
    """
    i32 = jnp.int32

    def refill(b, state):
        def _cond(s):
            return (s[1] == 0) & (s[0] < words)

        def _next(s, b=b):
            return s[0] + 1, mask_ref[0, 0, r, b, s[0]]

        return jax.lax.while_loop(_cond, _next, state)

    def outer_cond(state):
        alive = jnp.zeros((), jnp.bool_)
        for b in range(G):
            w, m = state[2 * b], state[2 * b + 1]
            alive = alive | (m != 0) | (w < words)
        return alive

    def outer_body(state):
        new_state = []
        s_b = []
        for b in range(G):
            w, m = refill(b, (state[2 * b], state[2 * b + 1]))
            s_b.append(_scalar_lsb_index(m) + (w - 1) * 16)
            new_state += [w, m & (m - 1)]
        # sentinel (exhausted band): clamp to cluster 0 — its lanes flagged
        # nothing there, so the sweep returns misses (flags are a superset
        # of hits); wasteful only, never wrong
        s_cl = [jnp.maximum(s, 0) for s in s_b]
        for b in range(G):
            cat_s[16 * b:16 * (b + 1), :] = c_tab[s_cl[b]]
        liota_b = jax.lax.broadcasted_iota(i32, (1, 128), 1) // (128 // G)
        S = jnp.broadcast_to(s_cl[G - 1], liota_b.shape)
        for b in range(G - 1):
            S = jnp.where(liota_b == b, s_cl[b], S)
        q = jax.lax.dot_general(
            cat_s[...], f_big,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [4*F, 128]
        do_sweep(q, S)
        return tuple(new_state)

    # interleave: state[2b] = w_b, state[2b+1] = m_b
    state0 = tuple(jnp.zeros((), i32) for _ in range(2 * G))
    jax.lax.while_loop(outer_cond, outer_body, state0)


def _band_kernel(
    mask_ref,  # SMEM i32 [1, 1, 8, G, words]  (this pass's words)
    union_ref,  # SMEM i32 [1, 1, 1, 8]
    c_ref,  # ANY f32 [1, Cp, 16, 256]: this pass's transposed coeff table
    f_ref,  # VMEM f32 [10, RAY_BLOCK] ray features
    prim_ref, dist_ref,  # outputs [RAY_BLOCK//128, 128]
    tab_s,  # VMEM scratch [Cp, 16, 256]: pass-resident coefficient table
    cat_s,  # VMEM scratch [G*16, 256]: concatenated scheduled clusters
    prim_s, dist_s,  # VMEM scratch [n_pad//128, 128], persists across grid
    sem,  # DMA semaphore
    *, P: int, Cp: int, words: int, G: int,
):
    p = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)
    F = CLUSTER_SUB

    @pl.when(p == 0)
    def _init():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_s[blk, :] = jnp.full(
            (RAY_BLOCK // 128, 128), NULL_PRIMITIVE, jnp.int32
        )
        dist_s[blk, :] = jnp.full((RAY_BLOCK // 128, 128), FLT_MAX, jnp.float32)

    @pl.when(i == 0)
    def _load_pass():
        # single-buffered pass table: the default pipeline would double-
        # buffer a multi-MB block and blow VMEM, so DMA it explicitly once
        # per pass (the grid is sequential; blocks within a pass reuse it)
        cp = pltpu.make_async_copy(c_ref.at[p], tab_s, sem)
        cp.start()
        cp.wait()

    iota6 = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 0)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (G * 16, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (G * 16, 128), 1)
    band_match = (kiota // 16) == (liota // (128 // G))

    for r in range(RAY_BLOCK // 128):
        def _row(r=r):
            f = f_ref[:, r * 128:(r + 1) * 128]  # [10, 128]
            fpad = jnp.concatenate(
                [f, jnp.zeros((6, 128), jnp.float32)], axis=0
            )  # [16, 128]
            f_rep = jnp.concatenate([fpad] * G, axis=0)  # [G*16, 128]
            f_big = jnp.where(band_match, f_rep, 0.0)
            row = pl.ds(base + r, 1)

            def do_sweep(q, S):
                det = q[0 * F:1 * F, :]
                bx = q[1 * F:2 * F, :]
                by = q[2 * F:3 * F, :]
                td = q[3 * F:4 * F, :]
                sd = det * det
                bxd = bx * det
                byd = by * det
                v = jnp.minimum(bxd, byd)
                v = jnp.minimum(v, sd - bxd - byd)
                v = jnp.minimum(v, sd - PLUCKER_EPS2)
                tdd = td * det
                u = jnp.minimum(v, tdd)
                rs = jax.lax.rsqrt(sd)
                tval = jnp.where(u >= 0.0, tdd * rs * rs, FLT_MAX)
                kb = ~((1 << _key_bits(F)) - 1)
                key = (
                    jax.lax.bitcast_convert_type(tval, jnp.int32) & kb
                ) | iota6
                kmin = jnp.min(key, axis=0, keepdims=True)  # [1, 128]
                tmin = jax.lax.bitcast_convert_type(kmin & kb, jnp.float32)
                # id base is PER LANE: (pass base + local cluster) * 64
                id_base = (p * Cp + S) * F
                upd = (kmin < _key_miss(F)) & (tmin < dist_s[row, :])
                dist_s[row, :] = jnp.where(upd, tmin, dist_s[row, :])
                prim_s[row, :] = jnp.where(
                    upd, (kmin & ~kb) + id_base, prim_s[row, :]
                )

            _band_sweep_loop(mask_ref, r, tab_s, cat_s, f_big, words, G,
                             do_sweep)

        pl.when(union_ref[0, 0, 0, r] != 0)(_row)

    @pl.when(p == P - 1)
    def _flush():
        blk = pl.ds(base, RAY_BLOCK // 128)
        prim_ref[:] = prim_s[blk, :]
        dist_ref[:] = dist_s[blk, :]


def _band_occl_kernel(
    mask_ref,  # SMEM i32 [1, 1, 8, G, words]
    union_ref,  # SMEM i32 [1, 1, 1, 8]
    c_ref,  # ANY f32 [1, Cp, 16, 256]
    f_ref,  # VMEM f32 [10, RAY_BLOCK]
    tm_ref,  # VMEM f32 [1, RAY_BLOCK] segment tmax
    occ_ref,  # output [RAY_BLOCK//128, 128] i32
    tab_s, cat_s,  # VMEM scratch (see _band_kernel)
    occ_s,  # VMEM scratch [n_pad//128, 128] i32
    sem,
    *, P: int, Cp: int, words: int, G: int,
):
    """Any-hit twin of :func:`_band_kernel`."""
    p = pl.program_id(0)
    i = pl.program_id(1)
    base = i * (RAY_BLOCK // 128)
    F = CLUSTER_SUB

    @pl.when(p == 0)
    def _init():
        occ_s[pl.ds(base, RAY_BLOCK // 128), :] = jnp.zeros(
            (RAY_BLOCK // 128, 128), jnp.int32
        )

    @pl.when(i == 0)
    def _load_pass():
        cp = pltpu.make_async_copy(c_ref.at[p], tab_s, sem)
        cp.start()
        cp.wait()

    kiota = jax.lax.broadcasted_iota(jnp.int32, (G * 16, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (G * 16, 128), 1)
    band_match = (kiota // 16) == (liota // (128 // G))

    for r in range(RAY_BLOCK // 128):
        def _row(r=r):
            f = f_ref[:, r * 128:(r + 1) * 128]
            fpad = jnp.concatenate(
                [f, jnp.zeros((6, 128), jnp.float32)], axis=0
            )
            f_rep = jnp.concatenate([fpad] * G, axis=0)
            f_big = jnp.where(band_match, f_rep, 0.0)
            tm = tm_ref[:, r * 128:(r + 1) * 128]  # [1, 128]
            row = pl.ds(base + r, 1)

            def do_sweep(q, S):
                det = q[0 * F:1 * F, :]
                bx = q[1 * F:2 * F, :]
                by = q[2 * F:3 * F, :]
                td = q[3 * F:4 * F, :]
                sd = det * det
                bxd = bx * det
                byd = by * det
                v = jnp.minimum(bxd, byd)
                v = jnp.minimum(v, sd - bxd - byd)
                v = jnp.minimum(v, sd - PLUCKER_EPS2)
                tdd = td * det
                w = jnp.minimum(jnp.minimum(v, tdd), tm * sd - tdd)
                wmax = jnp.max(w, axis=0, keepdims=True)
                occ_s[row, :] = occ_s[row, :] | (wmax >= 0.0).astype(jnp.int32)

            _band_sweep_loop(mask_ref, r, tab_s, cat_s, f_big, words, G,
                             do_sweep)

        pl.when(union_ref[0, 0, 0, r] != 0)(_row)

    @pl.when(p == P - 1)
    def _flush():
        occ_ref[:] = occ_s[pl.ds(base, RAY_BLOCK // 128), :]


def precompute_band_coeffs(tri_packed, tri_order=None):
    """Build-time transposed coefficient table for the banded kernel:
    f32 [C, 16, 256] — cluster c's block holds K (10 used of 16) on
    sublanes and M = 4 planes x 64 triangles on lanes, so the in-kernel
    concatenation of G scheduled clusters writes [16, 256] slices at
    16-aligned sublane offsets.  Returns (table, center)."""
    num_tris = tri_packed.shape[0]
    if tri_order is not None:
        tri_packed = tri_packed[tri_order]
    C = -(-num_tris // CLUSTER_SUB)
    t_pad = C * CLUSTER_SUB
    v0 = tri_packed[:, 0:3]
    center = jax.lax.stop_gradient(0.5 * (v0.min(axis=0) + v0.max(axis=0)))
    coeffs = _plucker_coeffs(
        tri_packed, center, jnp.arange(num_tris, dtype=jnp.int32)
    )[0:4]  # [4, T, 10]
    coeffs = jnp.pad(
        coeffs, ((0, 0), (0, t_pad - num_tris), (0, BAND_KPAD - 10))
    )  # [4, t_pad, 16]
    coeffs = coeffs.reshape(4, C, CLUSTER_SUB, BAND_KPAD)
    coeffs = coeffs.transpose(1, 3, 0, 2)  # [C, K, plane, tri]
    return coeffs.reshape(C, BAND_KPAD, 4 * CLUSTER_SUB), center


def _band_take_pre(coeffs_pre, center_pre, C):
    if coeffs_pre is None or center_pre is None:
        return None
    if (
        coeffs_pre.ndim != 3
        or coeffs_pre.shape[0] != C
        or coeffs_pre.shape[1] != BAND_KPAD
        or coeffs_pre.shape[2] != 4 * CLUSTER_SUB
    ):
        return None
    return coeffs_pre, center_pre


def _band_prepass(tri_packed, ray_o, ray_d, tri_order, cluster_bounds, tmax,
                  G, feat_pad_value, coeffs_pre=None, center_pre=None):
    """Shared setup for the banded entry points."""
    n = ray_o.shape[0]
    num_tris = tri_packed.shape[0]
    C = -(-num_tris // CLUSTER_SUB)
    assert cluster_bounds.shape[0] == C, "cluster_bounds must be per 64 tris"
    P, Cp, words = _band_pass_split(C)
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    n_blocks = n_pad // RAY_BLOCK

    pre = _band_take_pre(coeffs_pre, center_pre, C)
    if pre is not None and tri_order is None:
        table, center = pre
    else:
        table, center = precompute_band_coeffs(tri_packed, tri_order)
    # split into P equal passes (zero-coefficient padding clusters never
    # flag and never hit: det == 0)
    table = jnp.pad(table, ((0, P * Cp - C), (0, 0), (0, 0)))
    table = table.reshape(P, Cp, BAND_KPAD, 4 * CLUSTER_SUB)

    mask, union = _band_mask_bits(
        cluster_bounds, ray_o, ray_d, tmax, n_blocks, P, Cp, G
    )

    o = ray_o - center
    m = jnp.cross(o, ray_d)
    feats = jnp.concatenate(
        [ray_d, m, o, jnp.ones_like(o[:, :1])], axis=1
    )  # [N, 10]
    feats = jnp.pad(feats, ((0, n_pad - n), (0, 0)),
                    constant_values=feat_pad_value)
    return {
        "P": P, "Cp": Cp, "words": words, "n_pad": n_pad,
        "n_blocks": n_blocks, "table": table, "center": center,
        "mask": mask, "union": union, "feats": feats.T,
    }


def _band_specs(P, Cp, words, G, n_pad, with_tm=False):
    mask_spec = pl.BlockSpec(
        (1, 1, RAY_BLOCK // 128, G, words), lambda p, i: (i, p, 0, 0, 0),
        memory_space=pltpu.SMEM,
    )
    union_spec = pl.BlockSpec(
        (1, 1, 1, RAY_BLOCK // 128), lambda p, i: (i, p, 0, 0),
        memory_space=pltpu.SMEM,
    )
    c_spec = pl.BlockSpec(memory_space=pl.ANY)
    f_spec = pl.BlockSpec(
        (10, RAY_BLOCK), lambda p, i: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_BLOCK // 128, 128), lambda p, i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [mask_spec, union_spec, c_spec, f_spec]
    if with_tm:
        in_specs.append(pl.BlockSpec(
            (1, RAY_BLOCK), lambda p, i: (0, i), memory_space=pltpu.VMEM
        ))
    scratch = [
        pltpu.VMEM((Cp, BAND_KPAD, 4 * CLUSTER_SUB), jnp.float32),
        pltpu.VMEM((G * 16, 4 * CLUSTER_SUB), jnp.float32),
    ]
    row_shape = (n_pad // 128, 128)
    return in_specs, out_spec, scratch, row_shape


# NOTE on the mask walk inside _band_sweep_loop: the SMEM mask ref passed
# to the kernels is the per-(pass, block) slice [1, 8, G, 1, words]; the
# refill indexes it as [0, r, b, w] after squeezing the pass axis — the
# kernels re-view the ref accordingly.


@functools.partial(jax.jit, static_argnames=("interpret", "G"))
def intersect_plucker_band(
    tri_packed, ray_o, ray_d,
    tri_order=None, cluster_bounds=None, tmax=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, G: int = 8,
):
    """Closest hit via the banded pass-resident MXU sweep (see the block
    comment above).  Semantics match :func:`intersect_plucker_pallas`:
    positional winner ids (remapped through ``tri_order`` if given),
    selector-grade dist, ``tmax = -inf`` lanes are dead.
    ``cluster_bounds`` is REQUIRED and must be the uniform 64-tri grid
    (one AABB per 64 consecutive slots)."""
    assert cluster_bounds is not None, "banded path requires cluster bounds"
    n = ray_o.shape[0]
    if n > BAND_MAX_LANES:
        prims, dists = [], []
        for lo in range(0, n, BAND_MAX_LANES):
            hi = lo + BAND_MAX_LANES
            p, t = intersect_plucker_band(
                tri_packed, ray_o[lo:hi], ray_d[lo:hi],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                tmax=None if tmax is None else tmax[lo:hi],
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, G=G,
            )
            prims.append(p)
            dists.append(t)
        return jnp.concatenate(prims), jnp.concatenate(dists)

    pp = _band_prepass(tri_packed, ray_o, ray_d, tri_order, cluster_bounds,
                       tmax, G, feat_pad_value=1.0,
                       coeffs_pre=coeffs_pre, center_pre=center_pre)
    P, Cp, words = pp["P"], pp["Cp"], pp["words"]
    n_pad, n_blocks = pp["n_pad"], pp["n_blocks"]

    in_specs, out_spec, scratch, row_shape = _band_specs(
        P, Cp, words, G, n_pad
    )
    prim, dist = pl.pallas_call(
        functools.partial(_band_kernel, P=P, Cp=Cp, words=words, G=G),
        grid=(P, n_blocks),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(row_shape, jnp.int32),
            jax.ShapeDtypeStruct(row_shape, jnp.float32),
        ],
        scratch_shapes=scratch + [
            pltpu.VMEM(row_shape, jnp.int32),
            pltpu.VMEM(row_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(pp["mask"], pp["union"], pp["table"], pp["feats"])

    prim = prim.reshape(-1)[:n]
    dist = dist.reshape(-1)[:n]
    prim = jnp.where(
        (dist < FLT_MAX) & (prim < tri_packed.shape[0]), prim, NULL_PRIMITIVE
    )
    if tri_order is not None:
        prim = jnp.where(
            prim >= 0, tri_order[jnp.maximum(prim, 0)], NULL_PRIMITIVE
        )
    return prim, dist


@functools.partial(jax.jit, static_argnames=("interpret", "G"))
def occlusion_plucker_band(
    tri_packed, x, y,
    tri_order=None, cluster_bounds=None,
    coeffs_pre=None, center_pre=None,
    interpret: bool = False, G: int = 8,
):
    """Any-hit segment query via the banded sweep — twin of
    :func:`occlusion_plucker_pallas`."""
    assert cluster_bounds is not None, "banded path requires cluster bounds"
    if x.shape[0] > BAND_MAX_LANES:
        return jnp.concatenate([
            occlusion_plucker_band(
                tri_packed, x[lo:lo + BAND_MAX_LANES],
                y[lo:lo + BAND_MAX_LANES],
                tri_order=tri_order, cluster_bounds=cluster_bounds,
                coeffs_pre=coeffs_pre, center_pre=center_pre,
                interpret=interpret, G=G,
            )
            for lo in range(0, x.shape[0], BAND_MAX_LANES)
        ])
    eps = 1e-4
    d = y - x
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-24))
    dirn = d / dist[..., None]
    max_dist = dist - eps
    ray_o = x + dirn * 1e-5
    n = ray_o.shape[0]

    pp = _band_prepass(tri_packed, ray_o, dirn, tri_order, cluster_bounds,
                       max_dist, G, feat_pad_value=0.0,
                       coeffs_pre=coeffs_pre, center_pre=center_pre)
    P, Cp, words = pp["P"], pp["Cp"], pp["words"]
    n_pad, n_blocks = pp["n_pad"], pp["n_blocks"]
    tmrow = jnp.pad(max_dist, (0, n_pad - n), constant_values=-FLT_MAX)
    tmrow = tmrow[None, :]  # [1, N_pad] f32

    in_specs, out_spec, scratch, row_shape = _band_specs(
        P, Cp, words, G, n_pad, with_tm=True
    )
    occ = pl.pallas_call(
        functools.partial(_band_occl_kernel, P=P, Cp=Cp, words=words, G=G),
        grid=(P, n_blocks),
        in_specs=in_specs,
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct(row_shape, jnp.int32)],
        scratch_shapes=scratch + [
            pltpu.VMEM(row_shape, jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(pp["mask"], pp["union"], pp["table"], pp["feats"], tmrow)[0]

    return occ.reshape(-1)[:n] != 0


# Above this triangle count the O(N*T) dense sweep loses to the BVH walk:
# the sweep sustains ~7.7 G ray-tri tests/s (VPU-bound: ~8 ops/pair epilogue)
# while the gather-bound lockstep walk costs ~45 ms per 25k-ray traversal
# roughly independent of T — crossover around 10-20k triangles at 800^2.
PALLAS_BRUTE_MAX_TRIS = 16384

# The MXU Plücker sweep runs ~3x faster (~21 G pairs/s, epilogue-bound), so
# its crossover against the lockstep walk sits ~3x higher.  Above 65k the
# scan still beats the compacted work-list engine (measured at 111k tris,
# round 2: fine-granularity flag counts overflow any SMEM-fittable work
# budget, so compact degenerates to scan + wasted prepass); the scan's own
# ceiling is its (ray block x chunk) grid — ~1.2M steps at 1M tris.
PALLAS_MXU_MAX_TRIS = 131072


def pallas_available() -> bool:
    """True when the default DEVICE can run Mosaic TPU kernels (respects
    jax_default_device, which tests pin to CPU)."""
    try:
        dev = jax.config.jax_default_device or jax.devices()[0]
        return dev.platform == "tpu"
    except Exception:  # noqa: BLE001
        return False

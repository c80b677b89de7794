"""Frame-level sweep-pair accounting: the renderer's MFU analogue.

The MXU sweep engines' cost is proportional to SWEPT ray-triangle pairs:
each (128-lane row, flagged 64-tri cluster) work item evaluates
128 x 64 pairs (accel/pallas_kernels.py).  This module replays a frame's
wavefronts (primary, per-depth extension + shadow, the same ordering the
engines see: tile-order primaries, signature-sorted bounces/shadows) and
counts

* ``pairs_swept``  — sum over rows of |row-union of flagged clusters| * 64 * 128
* ``pairs_floor``  — sum over rays of |per-ray flagged clusters| * 64
                     (the cost of a hypothetical perfect per-ray engine)

from which bench.py derives pair throughput and utilization against the
measured per-chip ceilings (BASELINE.md "Known perf ceilings"):

* VPU:  the sweep epilogue is ~22 f32 ops/pair and the measured effective
  VPU rate is ~0.45 T ops/s => ~20.5 G pairs/s ceiling.
* MXU:  each pair streams 4 decision planes x K=10 coefficients through a
  single-pass-equivalent bf16 matmul at HIGHEST precision (~6 passes):
  ~480 bf16 flops/pair against the ~197 Tflop/s v5e MXU.

These are MODEL numbers (documented constants below), good for comparing
design changes round over round — not hardware counters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdf import materials as bsdf
from ..render import pathtrace as pt
from ..sampling import rng
from ..scene import device_scene as dsc
from ..utils import math as m

# measured / modeled ceilings (v5e, BASELINE.md "Known perf ceilings")
VPU_EFFECTIVE_OPS = 0.45e12  # f32 elementwise ops/s the sweeps sustain
OPS_PER_PAIR_VPU = 22.0  # Plücker scan epilogue ops per pair
MXU_BF16_FLOPS = 197e12  # v5e MXU peak
FLOPS_PER_PAIR_MXU = 480.0  # 4 planes x K=10 x 2 x ~6 HIGHEST passes

PAIR_RATE_CEILING = VPU_EFFECTIVE_OPS / OPS_PER_PAIR_VPU  # ~20.5 G pairs/s
# NOTE (round 5): the VPU ceiling dates from 64-tri clusters at HIGHEST
# precision.  With bf16x6 dots and 512-tri cull clusters, teapot_hires
# sustains a measured 38.8 G pairs/s — "vpu_util_pct" above 100 on big
# scenes means the sweep has shifted MXU-ward, not that the measurement
# is wrong; read gpairs_per_s and cull_efficiency_pct as the primary
# round-over-round comparators.


def _row_union_and_floor(cb, ray_o, ray_d, active, tmax=None, lanes=128,
                         chunk=65536):
    """(sum of per-row union counts, sum of per-ray counts) as device
    scalars; rays must already be in the order the engine sweeps them."""
    n = ray_o.shape[0]
    n_use = n - n % lanes
    union_sum = jnp.zeros((), jnp.float32)
    ray_sum = jnp.zeros((), jnp.float32)
    chunk = max(lanes, chunk - chunk % lanes)
    for lo in range(0, n_use, chunk):
        o = ray_o[lo:lo + chunk]
        d = ray_d[lo:lo + chunk]
        inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
        tn = jnp.full((o.shape[0], cb.shape[0]), -3.4e38)
        tf = jnp.full((o.shape[0], cb.shape[0]), 3.4e38)
        for k in range(3):
            a = (cb[None, :, k] - o[:, k, None]) * inv[:, k, None]
            b = (cb[None, :, 3 + k] - o[:, k, None]) * inv[:, k, None]
            tn = jnp.maximum(tn, jnp.minimum(a, b))
            tf = jnp.minimum(tf, jnp.maximum(a, b))
        h = (tf >= jnp.maximum(tn, 0.0)) & active[lo:lo + chunk, None]
        if tmax is not None:
            h = h & (tn < tmax[lo:lo + chunk, None])
        ray_sum += h.sum(dtype=jnp.float32)
        hr = h.reshape(-1, lanes, cb.shape[0]).any(axis=1)
        union_sum += hr.sum(dtype=jnp.float32)
    return union_sum, ray_sum


def frame_pair_stats(ds: dsc.DeviceScene, cam, looper: int, max_depth: int):
    """Replay one frame's wavefronts and return pair totals (python floats).

    Requires a clustered scene (``ds.cluster_bounds``); returns None
    otherwise.  The replay mirrors render/pathtrace.py's loop (unrolled in
    Python) — sampling decisions use the same RNG stream, so wavefronts
    match the real frame's up to estimator noise.
    """
    if ds.cluster_bounds is None:
        return None
    cb = ds.cluster_bounds
    n = cam.width * cam.height

    perm = None
    if (ds.sort_primaries and cam.width % pt.TILE_W == 0
            and cam.height % pt.TILE_H == 0):
        perm = jnp.asarray(pt._tile_perm(cam.width, cam.height))
    idx = perm if perm is not None else jnp.arange(n, dtype=jnp.int32)
    sampler = rng.make_sampler(looper, idx)
    ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, idx)
    isect = jax.jit(lambda o, d: dsc.intersect(ds, o, d))
    keyf = jax.jit(
        lambda o, d, tm: dsc._sort_key(ds, o, d, tmax=tm),
        static_argnames=(),
    )
    stats = jax.jit(
        _row_union_and_floor, static_argnames=("lanes", "chunk")
    )

    def sorted_stats(o, d, active, tmax=None):
        tm = tmax if tmax is not None else jnp.full((n,), 3.4e38)
        key = keyf(o, d, tm)
        key = jnp.where(active, key, key + dsc._DEAD_KEY_BIT)
        order = jnp.argsort(key)
        return stats(cb, o[order], d[order], active[order],
                     None if tmax is None else tmax[order])

    it = isect(ray_o, ray_d)
    hit = it.prim_id != -1
    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    active = hit & (mat.mtype != dsc.MAT_LIGHT)
    pos = it.pos

    sweeps = [stats(cb, ray_o, ray_d, hit)]  # primaries: already tile order

    for _depth in range(1, max_depth + 1):
        wo = -ray_d
        is_delta = mat.mtype == dsc.MAT_DIELECTRIC
        flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
        norm = jnp.where(flip[..., None], -norm, norm)

        # shadow wavefront (sample_direct_light semantics incl. horizon cull)
        r4, sampler = rng.sample_4d(ds.sobol, sampler)
        li, wi, ldist, lpdf = dsc.sample_direct_light_no_vis(ds, pos, r4)
        ok = active & (~is_delta) & (lpdf > 0.0) & (m.dot(norm, wi) > 0.0)
        seg_d = wi * ldist[..., None]
        sweeps.append(sorted_stats(pos, seg_d, ok, tmax=jnp.ones(n)))

        # extension wavefront
        r3, sampler = rng.sample_3d(ds.sobol, sampler)
        samp = jax.jit(bsdf.bsdf_sample)(mat, norm, wo, r3)
        bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
        active = active & ~bad
        ray_d = samp.dir
        ray_o = pos + ray_d * 1e-5
        sweeps.append(sorted_stats(ray_o, ray_d, active))

        it = isect(ray_o, ray_d)
        miss = active & (it.prim_id == -1)
        active = active & ~miss
        pos = it.pos
        mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
        active = active & (mat.mtype != dsc.MAT_LIGHT)

    union_total = float(sum(float(s[0]) for s in sweeps))
    ray_total = float(sum(float(s[1]) for s in sweeps))
    csub = float(ds.cluster_sub)
    return {
        "pairs_swept": union_total * csub * 128.0,
        "pairs_floor": ray_total * csub,
    }


def utilization(pair_stats: dict, frame_ms: float) -> dict:
    """Derive throughput/utilization fields from frame_pair_stats output."""
    if not pair_stats or frame_ms <= 0:
        return {}
    rate = pair_stats["pairs_swept"] / (frame_ms * 1e-3)
    return {
        "gpairs_per_s": round(rate / 1e9, 2),
        "vpu_util_pct": round(100.0 * rate / PAIR_RATE_CEILING, 1),
        "mxu_util_pct": round(
            100.0 * rate * FLOPS_PER_PAIR_MXU / MXU_BF16_FLOPS, 1
        ),
        "cull_efficiency_pct": round(
            100.0 * pair_stats["pairs_floor"]
            / max(pair_stats["pairs_swept"], 1.0), 1,
        ),
    }

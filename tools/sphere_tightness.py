#!/usr/bin/env python
"""CPU answer to "can the scan engine's slab prepass become the MXU sphere
test without blowing up the sweep?": replays real bounce wavefronts
(tools/bounce_stats.py machinery) and compares row-union flagged FINE
cluster counts for the exact slab test vs the exact sphere test (the
bounding sphere of each cluster AABB, the same test _sphere_flags encodes
as matmul planes).

The sweep cost is proportional to the row-union count, so the printed
ratio bounds the sweep-cost increase of swapping the prepass; the prepass
itself drops from ~27 VPU ops/(ray,cluster) to one 3x16 MXU dot.

Usage: [JAX_PLATFORMS=cpu] python tools/sphere_tightness.py scenes/teapot_hires.txt [res] [depth]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from radish_pt_tpu.bsdf import materials as bsdf  # noqa: E402
from radish_pt_tpu.render import pathtrace as pt  # noqa: E402
from radish_pt_tpu.sampling import rng  # noqa: E402
from radish_pt_tpu.scene import build as sbuild  # noqa: E402
from radish_pt_tpu.scene import device_scene as dsc  # noqa: E402
from radish_pt_tpu.scene.parser import parse_scene  # noqa: E402
from radish_pt_tpu.utils import math as m  # noqa: E402

from bounce_stats import flags as slab_flags  # noqa: E402


def slab_flags_tn(cb, ray_o, ray_d, active):
    """Slab flags + per-(ray, cluster) entry distances (like
    _row_flags(with_tn=True) before the row reduce)."""
    inv = 1.0 / jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, 1e-12)
    tn = jnp.full((ray_o.shape[0], cb.shape[0]), -3.4e38)
    tf = jnp.full((ray_o.shape[0], cb.shape[0]), 3.4e38)
    for k in range(3):
        a = (cb[None, :, k] - ray_o[:, k, None]) * inv[:, k, None]
        b = (cb[None, :, 3 + k] - ray_o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    hit = (tf >= jnp.maximum(tn, 0.0)) & active[:, None]
    return hit, tn


def sphere_flags(cb, ray_o, ray_d, active):
    """Exact ray-vs-bounding-sphere flags (unit |d|), bool [N, C]."""
    p = 0.5 * (cb[:, 0:3] + cb[:, 3:6])  # [C, 3]
    r = 0.5 * jnp.linalg.norm(cb[:, 3:6] - cb[:, 0:3], axis=1)  # [C]
    oc = ray_o[:, None, :] - p[None, :, :]  # [N, C, 3]
    t_star = -jnp.sum(oc * ray_d[:, None, :], axis=-1)  # [N, C]
    d2 = jnp.sum(oc * oc, axis=-1) - t_star * t_star
    hit = (d2 <= r[None, :] ** 2) & (t_star + r[None, :] >= 0.0)
    return hit & active[:, None]


def split_bounds(ds, splits: int):
    """[C*splits, 6] AABBs of each cluster's leaf-order sub-segments
    (padding slots — degenerate all-zero triangles — excluded; empty
    sub-segments get inverted boxes that can never flag)."""
    tv = np.asarray(ds.tri_v)  # [C*64, 3, 3] slot order
    C = ds.cluster_bounds.shape[0]
    sub = tv.shape[0] // C
    real = ~(np.abs(tv).sum(axis=(1, 2)) == 0.0)  # padding = all-zero
    lo = np.where(real[:, None, None], tv, np.inf).min(axis=1)
    hi = np.where(real[:, None, None], tv, -np.inf).max(axis=1)
    k = sub // splits
    lo = lo.reshape(C * splits, k, 3).min(axis=1)
    hi = hi.reshape(C * splits, k, 3).max(axis=1)
    return np.concatenate([lo, hi], axis=1).astype(np.float32)


def split_sphere_flags(sb, splits, ray_o, ray_d, active):
    """OR of the sub-segment sphere tests, reduced back to [N, C]."""
    f = sphere_flags(jnp.asarray(sb), ray_o, ray_d, active)
    return f.reshape(f.shape[0], -1, splits).any(axis=-1)


def row_stats(h, perm):
    h = h[perm]
    n = h.shape[0] - h.shape[0] % 128
    h = h[:n]
    per_ray = float(h.sum(axis=1).mean())
    row = float(h.reshape(-1, 128, h.shape[1]).any(axis=1).sum(axis=1).mean())
    return per_ray, row


def termination_stats(hs, tn, t_true, win_unit, perm):
    """Mean swept units/row under the compact engine's NEAR-TO-FAR early
    termination, modeled faithfully: walk each 128-lane row's flagged
    units in entry order; a lane's best distance becomes its true t only
    once the unit CONTAINING its winner is swept (misses never settle,
    dead lanes start settled at 0); stop before a unit whose row entry
    bound exceeds every lane's best-so-far."""
    hs, tn = hs[perm], tn[perm]
    t_true, win_unit = t_true[perm], win_unit[perm]
    n = hs.shape[0] - hs.shape[0] % 128
    hs, tn = hs[:n], tn[:n]
    t_true, win_unit = t_true[:n], win_unit[:n]
    rows = n // 128
    flag = hs.reshape(rows, 128, -1).any(axis=1)  # [rows, C]
    tn_row = np.where(hs, np.maximum(tn, 0.0), np.inf).reshape(
        rows, 128, -1).min(axis=1)  # [rows, C]
    t_row = t_true.reshape(rows, 128)
    w_row = win_unit.reshape(rows, 128)
    swept = 0
    for r in range(rows):
        units = np.nonzero(flag[r])[0]
        order = units[np.argsort(tn_row[r, units])]
        cur = t_row[r].copy()
        unsettled = np.isfinite(cur) & (cur > 0.0)
        cur[unsettled] = np.inf  # live hit lanes settle at their winner unit
        k = len(order)
        for i, u in enumerate(order):
            if i and cur.max() < tn_row[r, u]:
                k = i
                break
            cur[w_row[r] == u] = t_row[r][w_row[r] == u]
        swept += k
    return swept / rows


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    max_depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    ds, cam = sbuild.build_device_scene(parse_scene(scene_path))
    cam = cam.replace(width=res, height=res)
    n = res * res
    cb = ds.cluster_bounds  # FINE clusters: the scan engine's cull units
    print(f"scene={scene_path} tris={ds.num_triangles} "
          f"fine-clusters={cb.shape[0]} lanes={n} depth={max_depth}",
          flush=True)

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler = rng.make_sampler(7, idx)
    # tile-order primaries, like the real frame
    perm0 = jnp.asarray(pt._tile_perm(res, res))
    ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, perm0)
    isect = jax.jit(lambda o, d: dsc.intersect(ds, o, d))
    slab = jax.jit(lambda o, d, a: slab_flags(cb, o, d, a))
    sph = jax.jit(lambda o, d, a: sphere_flags(cb, o, d, a))
    keyf = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))

    it = isect(ray_o, ray_d)
    hit = it.prim_id != -1
    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    active = hit & (mat.mtype != dsc.MAT_LIGHT)
    pos = it.pos

    sb2 = split_bounds(ds, 2)
    sb4 = split_bounds(ds, 4)
    sp2 = jax.jit(lambda o, d, a: split_sphere_flags(sb2, 2, o, d, a))
    sp4 = jax.jit(lambda o, d, a: split_sphere_flags(sb4, 4, o, d, a))

    slab_tn = jax.jit(lambda o, d, a: slab_flags_tn(cb, o, d, a))

    def report(tag, o, d, act, perm, it=None):
        hs = np.asarray(slab(o, d, act))
        hp = np.asarray(sph(o, d, act))
        h2 = np.asarray(sp2(o, d, act))
        h4 = np.asarray(sp4(o, d, act))
        # sphere >= slab is guaranteed (bounding sphere contains the AABB);
        # split spheres cover every TRIANGLE but not the whole cluster AABB,
        # so they may legitimately flag fewer rows than the slab test.
        assert not (hs & ~hp).any(), "sphere must be a superset of slab"
        prs, rows = row_stats(hs, perm)
        _, rowp = row_stats(hp, perm)
        _, row2 = row_stats(h2, perm)
        _, row4 = row_stats(h4, perm)
        # full-mask lexsort = an upper bound on what ANY sort key can
        # recover at 128-lane row granularity (rays grouped by their
        # entire flag vector, nearest cluster most significant)
        lex = np.lexsort(hs.T[::-1])
        _, rowlex = row_stats(hs, lex)
        cnt = hs.sum(axis=1)
        live = cnt[np.asarray(act)]
        if live.size:
            q = np.percentile(live, [50, 90, 99])
            print(f"    per-ray flag tail (live lanes): p50 {q[0]:.0f} "
                  f"p90 {q[1]:.0f} p99 {q[2]:.0f} max {live.max()}",
                  flush=True)
        print(f"  {tag:20s} slab row {rows:7.2f} (per-ray {prs:5.2f}, "
              f"lexsort ideal {rowlex:7.2f})   "
              f"sphere {rowp:7.2f} (x{rowp / max(rows, 1e-9):.2f})   "
              f"split2 {row2:7.2f} (x{row2 / max(rows, 1e-9):.2f})   "
              f"split4 {row4:7.2f} (x{row4 / max(rows, 1e-9):.2f})",
              flush=True)
        if it is not None:
            _, tn = jax.device_get(slab_tn(o, d, act))
            prim = np.asarray(it.prim_id)
            t_true = np.linalg.norm(
                np.asarray(it.pos) - np.asarray(o), axis=-1)
            t_true = np.where(prim >= 0, t_true, np.inf)
            t_true = np.where(np.asarray(act), t_true, 0.0)  # dead: settled
            win = np.where(prim >= 0, prim // 64, -1)
            term = termination_stats(hs, np.asarray(tn), t_true, win, perm)
            print(f"    near-to-far termination bound: {term:7.2f} "
                  f"units/row (vs union {rows:.2f})", flush=True)

    report("primary (tile order)", ray_o, ray_d, hit,
           np.arange(n), it=it)

    for depth in range(1, max_depth + 1):
        wo = -ray_d
        is_delta = mat.mtype == dsc.MAT_DIELECTRIC
        flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
        norm = jnp.where(flip[..., None], -norm, norm)
        r3, sampler = rng.sample_3d(ds.sobol, sampler)
        samp = jax.jit(bsdf.bsdf_sample)(mat, norm, wo, r3)
        bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
        active = active & ~bad
        ray_d = samp.dir
        ray_o = pos + ray_d * 1e-5

        key = np.asarray(keyf(ray_o, ray_d))
        key = key + np.where(np.asarray(active), 0, 1 << 24)
        perm = np.argsort(key, kind="stable")
        it = isect(ray_o, ray_d)
        report(f"bounce {depth} (sorted)", ray_o, ray_d, active, perm, it=it)
        miss = active & (it.prim_id == -1)
        active = active & ~miss
        pos = it.pos
        mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
        active = active & (mat.mtype != dsc.MAT_LIGHT)


if __name__ == "__main__":
    main()

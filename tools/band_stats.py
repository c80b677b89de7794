#!/usr/bin/env python
"""Banded-culling design probe (CPU-runnable).

The round-2 conclusion (BASELINE.md "Round-2 extended session") is that
128-lane row unions at big-scene bounces are tail-driven: per-ray fine-
cluster flags are p50=1 while the row union is ~84.  The round-3 candidate
engine splits each 128-lane row into G BANDS (128/G lanes each) and packs
one cluster PER BAND into each MXU sweep (G accumulated dots), so a row's
sweep count drops from |union over 128 lanes| to max_b |union over band b|.

This probe replays the real bounce wavefronts (same machinery as
bounce_stats.py) and reports, for the FINE 64-tri clusters the kernel
actually culls, after the shipped signature sort:

  per-ray floor | row-union (current cost) | max-band for G in {2,4,8,16}
  (the banded engine's per-row matmul count)

plus the same for SHADOW wavefronts, and the effect of refining the sort
key with the per-ray flag count (tail segregation).

Usage: [JAX_PLATFORMS=cpu] python tools/band_stats.py scenes/teapot_hires.txt [res] [depth]
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

GS = (2, 4, 8, 16)


def flags_fine(cb, ray_o, ray_d, active, tmax=None, chunk=65536):
    """Exact per-ray slab flags vs the FINE cluster bounds, bool [N, C]."""
    outs = []
    for lo in range(0, ray_o.shape[0], chunk):
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
        outs.append(np.asarray(h))
    return np.concatenate(outs, axis=0)


def band_stats(h, perm):
    """Per-ray floor, 128-row union, and max-band counts per G."""
    h = h[perm]
    n = h.shape[0] - h.shape[0] % 128
    h = h[:n].reshape(-1, 128, h.shape[1])  # [rows, 128, C]
    per_ray = float(h.sum(axis=2).mean())
    row_union = h.any(axis=1).sum(axis=1)  # [rows]
    out = {"per_ray": per_ray, "row_union": float(row_union.mean())}
    for G in GS:
        b = h.reshape(h.shape[0], G, 128 // G, -1).any(axis=2)  # [rows, G, C]
        cnt = b.sum(axis=2)  # [rows, G]
        out[f"maxband{G}"] = float(cnt.max(axis=1).mean())
        out[f"sumband{G}"] = float(cnt.sum(axis=1).mean())
    return out


def fmt(tag, s, alive=None):
    bands = "  ".join(
        f"G{G}:{s[f'maxband{G}']:6.1f}" for G in GS
    )
    extra = f"  alive {alive:.2f}" if alive is not None else ""
    return (f"  {tag:22s} floor {s['per_ray']:6.2f}  row {s['row_union']:6.1f}"
            f"  {bands}{extra}")


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    max_depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    ds, cam = sbuild.build_device_scene(parse_scene(scene_path))
    cam = cam.replace(width=res, height=res)
    n = res * res
    cb = ds.cluster_bounds
    print(f"scene={scene_path} tris={ds.num_triangles} "
          f"fine-clusters={cb.shape[0]} lanes={n} depth={max_depth}")

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler = rng.make_sampler(7, idx)
    ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, idx)
    isect = jax.jit(lambda o, d: dsc.intersect(ds, o, d))
    keyf = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))
    keyf_tm = jax.jit(lambda o, d, tm: dsc._sort_key(ds, o, d, tmax=tm))

    it = isect(ray_o, ray_d)
    hit = it.prim_id != -1
    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    active = hit & (mat.mtype != dsc.MAT_LIGHT)
    pos = it.pos

    # primaries in tile order (what the engine actually sweeps)
    tp = np.asarray(pt._tile_perm(res, res))
    h = flags_fine(cb, ray_o, ray_d, hit)
    print(fmt("primary (tile)", band_stats(h, tp)))

    for depth in range(1, max_depth + 1):
        wo = -ray_d
        is_delta = mat.mtype == dsc.MAT_DIELECTRIC
        flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
        norm = jnp.where(flip[..., None], -norm, norm)

        # shadow wavefront: NEE target sampling like the real loop
        r4, sampler = rng.sample_4d(ds.sobol, sampler)
        li, wi, ldist, lpdf = dsc.sample_direct_light_no_vis(ds, pos, r4)
        ok = np.asarray(
            active & (~is_delta) & (lpdf > 0.0) & (m.dot(norm, wi) > 0.0)
        )
        target = pos + wi * ldist[..., None]
        seg_d = np.asarray(target - pos)
        seg_len = np.linalg.norm(seg_d, axis=-1)
        h_sh = flags_fine(cb, pos, jnp.asarray(seg_d), jnp.asarray(ok),
                          tmax=jnp.ones(n))
        key_sh = np.asarray(keyf_tm(pos, jnp.asarray(seg_d), jnp.ones(n)))
        key_sh = key_sh + np.where(ok, 0, 1 << 24)
        perm_sh = np.argsort(key_sh, kind="stable")
        print(fmt(f"shadow {depth} (sorted)", band_stats(h_sh, perm_sh),
                  alive=float(ok.mean())))

        # extension wavefront
        r3, sampler = rng.sample_3d(ds.sobol, sampler)
        samp = jax.jit(bsdf.bsdf_sample)(mat, norm, wo, r3)
        bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
        active = active & ~bad
        ray_d = samp.dir
        ray_o = pos + ray_d * 1e-5

        h = flags_fine(cb, ray_o, ray_d, active)
        key = np.asarray(keyf(ray_o, ray_d))
        keyd = key + np.where(np.asarray(active), 0, 1 << 24)
        perm = np.argsort(keyd, kind="stable")
        st = band_stats(h, perm)
        print(fmt(f"bounce {depth} (sorted)", st,
                  alive=float(np.asarray(active).mean())))

        # tail-segregating refinement: (dead, clip(count), signature)
        cnt = np.clip(h.sum(axis=1), 0, 63)
        key2 = (np.where(np.asarray(active), 0, 1 << 30)
                + (cnt.astype(np.int64) << 24) + key)
        perm2 = np.argsort(key2, kind="stable")
        st2 = band_stats(h, perm2)
        print(fmt(f"bounce {depth} (cnt-sort)", st2))

        it = isect(ray_o, ray_d)
        miss = active & (it.prim_id == -1)
        active = active & ~miss
        pos = it.pos
        mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
        active = active & (mat.mtype != dsc.MAT_LIGHT)


if __name__ == "__main__":
    main()

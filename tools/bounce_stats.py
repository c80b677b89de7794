#!/usr/bin/env python
"""Per-depth wavefront coherence diagnostic (CPU-runnable).

Replays the real path_trace bounce loop (same BSDF-sampled directions as
render/pathtrace.py:123-207, unrolled in Python) and prints cull statistics
for every EXTENSION wavefront: per-ray flagged super-clusters (the floor),
row-union after the current signature sort, and row-union unsorted.

This answers "where does the glass config lose its coherence" without TPU
time: the sweep cost per bounce is proportional to the row-union cluster
count, so depths where sorted row-union >> per-ray floor are where a better
key (or a different engine) pays.

Usage: [JAX_PLATFORMS=cpu] python tools/bounce_stats.py scenes/glass.txt [res]
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


def super_cluster_bounds(ds):
    cb = ds.cluster_bounds
    if cb.shape[0] > 1:
        pad = cb.shape[0] % 2
        cbp = jnp.pad(cb, ((0, pad), (0, 0)), mode="edge") if pad else cb
        pairs = cbp.reshape(-1, 2, 6)
        cb = jnp.concatenate(
            [pairs[:, :, 0:3].min(axis=1), pairs[:, :, 3:6].max(axis=1)], 1
        )
    return cb


def flags(cb, ray_o, ray_d, active):
    inv = 1.0 / jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, 1e-12)
    tn = jnp.full((ray_o.shape[0], cb.shape[0]), -3.4e38)
    tf = jnp.full((ray_o.shape[0], cb.shape[0]), 3.4e38)
    for k in range(3):
        a = (cb[None, :, k] - ray_o[:, k, None]) * inv[:, k, None]
        b = (cb[None, :, 3 + k] - ray_o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    return (tf >= jnp.maximum(tn, 0.0)) & active[:, None]


def stat_row(tag, hit, perm=None):
    h = hit if perm is None else hit[perm]
    n = h.shape[0] - h.shape[0] % 128
    h = h[:n]
    per_ray = float(h.sum(axis=1).mean())
    row = float(h.reshape(-1, 128, h.shape[1]).any(axis=1).sum(axis=1).mean())
    return per_ray, row, f"  {tag:26s} per-ray {per_ray:6.2f}  row-union {row:6.2f}"


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/glass.txt"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    max_depth = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    ds, cam = sbuild.build_device_scene(parse_scene(scene_path))
    cam = cam.replace(width=res, height=res)
    n = res * res
    cb = super_cluster_bounds(ds)
    print(f"scene={scene_path} tris={ds.num_triangles} "
          f"super-clusters={cb.shape[0]} lanes={n} depth={max_depth}")

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler = rng.make_sampler(7, idx)
    ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, idx)
    isect = jax.jit(lambda o, d: dsc.intersect(ds, o, d))
    fl = jax.jit(lambda o, d, a: flags(cb, o, d, a))
    keyf = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))

    it = isect(ray_o, ray_d)
    hit = it.prim_id != -1
    mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
    active = hit & (mat.mtype != dsc.MAT_LIGHT)
    pos = it.pos

    print(stat_row("primary", np.asarray(fl(ray_o, ray_d, hit)))[2])

    for depth in range(1, max_depth + 1):
        wo = -ray_d
        is_delta = mat.mtype == dsc.MAT_DIELECTRIC
        flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
        norm = jnp.where(flip[..., None], -norm, norm)
        # skip NEE (doesn't change extension rays); BSDF sample like the loop
        r3, sampler = rng.sample_3d(ds.sobol, sampler)
        samp = jax.jit(bsdf.bsdf_sample)(mat, norm, wo, r3)
        bad = bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8)
        active = active & ~bad
        ray_d = samp.dir
        ray_o = pos + ray_d * 1e-5

        h = np.asarray(fl(ray_o, ray_d, active))
        key = np.asarray(keyf(ray_o, ray_d))
        key = key + np.where(np.asarray(active), 0, 1 << 24)
        perm = np.argsort(key, kind="stable")
        pr, row_s, line = stat_row(f"bounce {depth} (sorted)", h, perm)
        _, row_u, _ = stat_row("", h)
        frac = float(np.asarray(active).mean())
        n_delta = float(np.asarray(active & is_delta).mean())
        print(f"{line}  unsorted {row_u:6.2f}  alive {frac:.2f} "
              f"delta {n_delta:.2f}")

        it = isect(ray_o, ray_d)
        miss = active & (it.prim_id == -1)
        active = active & ~miss
        pos = it.pos
        mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
        active = active & (mat.mtype != dsc.MAT_LIGHT)


if __name__ == "__main__":
    main()

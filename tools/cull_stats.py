#!/usr/bin/env python
"""Culling-headroom diagnostic: per-ray flagged sub-clusters vs the
row-union (128) and block-union (1024) the kernel sweeps, before/after
wavefront sorting.  Gap between per-ray and row-union = coherence loss the
sort could still recover; per-ray mean = floor for any union scheme."""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from radish_pt_tpu.render import pathtrace as pt
from radish_pt_tpu.sampling import rng
from radish_pt_tpu.scene import build as sbuild
from radish_pt_tpu.scene import device_scene as dsc
from radish_pt_tpu.scene.parser import parse_scene


def flags(ds, ray_o, ray_d):
    cb = ds.cluster_bounds
    inv = 1.0 / jnp.where(jnp.abs(ray_d) > 1e-12, ray_d, 1e-12)
    tn = jnp.full((ray_o.shape[0], cb.shape[0]), -3.4e38)
    tf = jnp.full((ray_o.shape[0], cb.shape[0]), 3.4e38)
    for k in range(3):
        a = (cb[None, :, k] - ray_o[:, k, None]) * inv[:, k, None]
        b = (cb[None, :, 3 + k] - ray_o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    return (tf >= jnp.maximum(tn, 0.0))


def stats(name, hit):
    n = hit.shape[0] - hit.shape[0] % 1024
    h = hit[:n]
    per_ray = h.sum(axis=1).mean()
    row = h.reshape(-1, 128, h.shape[1]).any(axis=1)
    blk = h.reshape(-1, 1024, h.shape[1]).any(axis=1)
    print(f"  {name:28s} per-ray {float(per_ray):6.2f}   "
          f"row-union {float(row.sum(axis=1).mean()):6.2f}   "
          f"block-union {float(blk.sum(axis=1).mean()):6.2f}   "
          f"(of {h.shape[1]})")


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot.txt"
    desc = parse_scene(scene_path)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    print(f"scene={scene_path} tris={ds.num_triangles} "
          f"clusters={ds.cluster_bounds.shape[0]} lanes={n}")

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    pos = jnp.asarray(np.asarray(it.pos))
    hitm = np.asarray(it.prim_id) >= 0
    key = jax.random.PRNGKey(0)
    sec_d = jax.random.normal(key, (n, 3))
    sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)

    f = jax.jit(lambda o, d: flags(ds, o, d))
    stats("primary (unsorted)", np.asarray(f(ray_o, ray_d)))

    o2 = pos + sec_d * 1e-5
    stats("bounce (unsorted)", np.asarray(f(o2, sec_d)))
    perm = np.asarray(jnp.argsort(dsc._sort_key(ds, o2, sec_d)))
    stats("bounce (sorted)", np.asarray(f(o2[perm], sec_d[perm])))
    # only rays that actually hit something bounce; dead rays sort back
    alive = perm[np.asarray(hitm)[perm]]
    stats("bounce (sorted, alive only)", np.asarray(f(o2[alive], sec_d[alive])))


if __name__ == "__main__":
    main()

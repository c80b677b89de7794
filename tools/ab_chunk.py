#!/usr/bin/env python
"""A/B the scan kernels' TRI_CHUNK on a big scene (teapot_hires).

Hypothesis (round-3 roadmap): at 111k tris the scan grid is
(217 chunks x 625 ray blocks) = 135k steps; at ~0.45 us/step pipeline cost
that is a ~60 ms floor per sweep regardless of culling.  Quadrupling
TRI_CHUNK cuts steps 4x at unchanged mask granularity (sub stays 64;
subs_per_chunk 8 -> 32 still fits one i32 mask word).

Run: timeout 1200 python -u tools/ab_chunk.py [scene] [chunks...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from radish_pt_tpu.accel import pallas_kernels as pk  # noqa: E402
from radish_pt_tpu.render import pathtrace as pt  # noqa: E402
from radish_pt_tpu.sampling import rng  # noqa: E402
from radish_pt_tpu.scene import build as sbuild  # noqa: E402
from radish_pt_tpu.scene import device_scene as dsc  # noqa: E402
from radish_pt_tpu.scene.parser import parse_scene  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timeit(fn, *a, n_warm=2, n_iter=6):
    for _ in range(n_warm):
        _sync(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
    chunks = [int(c) for c in sys.argv[2:]] or [512, 1024, 2048]
    desc = parse_scene(scene)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    print(f"scene={scene} tris={ds.num_triangles} lanes={n} "
          f"intersector={ds.intersector}", flush=True)

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    ray_o, ray_d = jax.device_get((ray_o, ray_d))
    ray_o, ray_d = jnp.asarray(ray_o), jnp.asarray(ray_d)

    # divergent bounce-like wavefront: hemisphere dirs at the primary hits,
    # signature-sorted exactly like intersect_sorted would
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    key = jax.random.PRNGKey(0)
    sec_d = jax.random.normal(key, (n, 3))
    sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)
    sec_o = it.pos + sec_d * 1e-5
    skey = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))(sec_o, sec_d)
    order = jnp.argsort(skey)
    sec_o = jax.device_get(sec_o[order])
    sec_d = jax.device_get(sec_d[order])
    sec_o, sec_d = jnp.asarray(sec_o), jnp.asarray(sec_d)

    # primary rays in tile order (what the real frame sweeps)
    perm = jnp.asarray(pt._tile_perm(cam.width, cam.height))
    po = ray_o[perm]
    pd = ray_d[perm]

    for tc in chunks:
        pk.TRI_CHUNK = tc
        pk.intersect_plucker_pallas.clear_cache()
        pk.occlusion_plucker_pallas.clear_cache()

        def isect(o, d):
            return pk.intersect_plucker_pallas(
                ds.tri_packed, o, d,
                tri_order=ds.tri_order, cluster_bounds=ds.cluster_bounds,
            )[1]

        f = jax.jit(isect)
        ms_p = timeit(f, po, pd)
        ms_b = timeit(f, sec_o, sec_d)

        def occl(o, d):
            return pk.occlusion_plucker_pallas(
                ds.tri_packed, o, o + d * 2.0,
                tri_order=ds.tri_order, cluster_bounds=ds.cluster_bounds,
            )

        ms_o = timeit(jax.jit(occl), sec_o, sec_d)
        print(f"TRI_CHUNK={tc:5d}: primary {ms_p:7.2f} ms  "
              f"bounce {ms_b:7.2f} ms  occl {ms_o:7.2f} ms", flush=True)

    # parity check at the last chunk size vs 512
    pk.TRI_CHUNK = chunks[-1]
    pk.intersect_plucker_pallas.clear_cache()
    p1, d1 = jax.jit(lambda o, d: pk.intersect_plucker_pallas(
        ds.tri_packed, o, d, tri_order=ds.tri_order,
        cluster_bounds=ds.cluster_bounds))(sec_o, sec_d)
    pk.TRI_CHUNK = 512
    pk.intersect_plucker_pallas.clear_cache()
    p0, d0 = jax.jit(lambda o, d: pk.intersect_plucker_pallas(
        ds.tri_packed, o, d, tri_order=ds.tri_order,
        cluster_bounds=ds.cluster_bounds))(sec_o, sec_d)
    same = float(jnp.mean((p0 == p1).astype(jnp.float32)))
    print(f"winner parity {chunks[-1]} vs 512: {same:.6f}", flush=True)


if __name__ == "__main__":
    main()

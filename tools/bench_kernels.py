#!/usr/bin/env python
"""Head-to-head slope benchmark of the intersection kernels on one scene.

Usage: python -u tools/bench_kernels.py [scene.txt]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from radish_pt_tpu.render import pathtrace as pt  # noqa: E402
from radish_pt_tpu.sampling import rng  # noqa: E402
from radish_pt_tpu.scene import build as sbuild  # noqa: E402
from radish_pt_tpu.scene import device_scene as dsc  # noqa: E402
from radish_pt_tpu.scene.parser import parse_scene  # noqa: E402
from radish_pt_tpu.accel import pallas_kernels as pk  # noqa: E402

KHI = 8


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1).view(np.uint8)[0])


def _run(f, *args, n_warm=2, n_iter=4):
    for _ in range(n_warm):
        sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n_iter * 1e3


def slope(name, stage, seed_val, *static):
    def rep(k):
        def f(x, *s):
            def body(i, c):
                out = stage(c, *s)
                return c + out * 1e-30
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f)

    t1 = _run(rep(1), seed_val, *static)
    thi = _run(rep(KHI), seed_val, *static)
    ms = (thi - t1) / (KHI - 1)
    print(f"  {name:44s} {ms:9.2f} ms   (k1={t1:.1f} k{KHI}={thi:.1f})")
    return ms


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot.txt"
    desc = parse_scene(scene_path)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    print(f"scene={scene_path} tris={ds.num_triangles} lanes={n}")

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    pos = jnp.asarray(jax.device_get(it.pos))
    key = jax.random.PRNGKey(0)
    sec_d = jax.random.normal(key, (n, 3))
    sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)
    # pre-sorted divergent rays (what the sweep actually sees in a frame)
    skey = np.asarray(dsc._sort_key(ds, pos, sec_d)) if (
        ds.cluster_bounds is not None) else np.zeros(n)
    perm = np.argsort(skey)
    o_s = jnp.asarray(np.asarray(pos)[perm])
    d_s = jnp.asarray(np.asarray(sec_d)[perm])

    cb = ds.cluster_bounds

    def quad_coh(c):
        return pk.intersect_quad_pallas(
            ds.tri_packed, ray_o + c[:, None], ray_d, cluster_bounds=cb)[1]

    def quad_div(c):
        return pk.intersect_quad_pallas(
            ds.tri_packed, o_s + c[:, None], d_s, cluster_bounds=cb)[1]

    def lin_coh(c):
        return pk.intersect_plucker_pallas(
            ds.tri_packed, ray_o + c[:, None], ray_d, cluster_bounds=cb)[1]

    def lin_div(c):
        return pk.intersect_plucker_pallas(
            ds.tri_packed, o_s + c[:, None], d_s, cluster_bounds=cb)[1]

    y_coh = pos + ray_d * 0.5
    y_div = o_s + d_s * 2.0

    def quad_occ(c):
        return pk.occlusion_quad_pallas(
            ds.tri_packed, o_s + c[:, None], y_div,
            cluster_bounds=cb).astype(jnp.float32)

    def lin_occ(c):
        return pk.occlusion_plucker_pallas(
            ds.tri_packed, o_s + c[:, None], y_div,
            cluster_bounds=cb).astype(jnp.float32)

    z = jnp.zeros(n)
    slope("quad closest (coherent primaries)", quad_coh, z)
    slope("linear closest (coherent primaries)", lin_coh, z)
    slope("quad closest (sorted divergent)", quad_div, z)
    slope("linear closest (sorted divergent)", lin_div, z)
    slope("quad occlusion (sorted divergent)", quad_occ, z)
    slope("linear occlusion (sorted divergent)", lin_occ, z)


if __name__ == "__main__":
    main()

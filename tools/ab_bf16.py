#!/usr/bin/env python
"""A/B the linear Plücker kernels: bf16x3 K-stacked vs f32 HIGHEST dots.

Usage: python -u tools/ab_bf16.py [scene.txt]
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


def slope(name, stage, seed_val):
    def rep(k):
        def f(x):
            def body(i, c):
                out = stage(c)
                return c + out * 1e-30
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f)

    t1 = _run(rep(1), seed_val)
    thi = _run(rep(KHI), seed_val)
    ms = (thi - t1) / (KHI - 1)
    print(f"  {name:52s} {ms:9.2f} ms   (k1={t1:.1f} k{KHI}={thi:.1f})")
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
    skey = np.asarray(dsc._sort_key(ds, pos, sec_d)) if (
        ds.cluster_bounds is not None) else np.zeros(n)
    perm = np.argsort(skey)
    o_s = jnp.asarray(np.asarray(pos)[perm])
    d_s = jnp.asarray(np.asarray(sec_d)[perm])
    cb = ds.cluster_bounds
    y_div = o_s + d_s * 2.0
    z = jnp.zeros(n)

    for flag in (False, True):
        tag = "bf16x3" if flag else "f32-HI"

        def lin_coh(c, flag=flag):
            return pk.intersect_plucker_pallas(
                ds.tri_packed, ray_o + c[:, None], ray_d, cluster_bounds=cb,
                bf16x3=flag)[1]

        def lin_div(c, flag=flag):
            return pk.intersect_plucker_pallas(
                ds.tri_packed, o_s + c[:, None], d_s, cluster_bounds=cb,
                bf16x3=flag)[1]

        def lin_occ(c, flag=flag):
            return pk.occlusion_plucker_pallas(
                ds.tri_packed, o_s + c[:, None], y_div,
                cluster_bounds=cb, bf16x3=flag).astype(jnp.float32)

        slope(f"[{tag}] closest (coherent primaries)", lin_coh, z)
        slope(f"[{tag}] closest (sorted divergent)", lin_div, z)
        slope(f"[{tag}] occlusion (sorted divergent)", lin_occ, z)


if __name__ == "__main__":
    main()

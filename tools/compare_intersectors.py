#!/usr/bin/env python
"""Compare intersector backends (pallas dense sweep vs MTBVH walk) on one
scene: raw closest-hit time for coherent primary and divergent secondary
rays, plus the full depth-5 frame.

Run: python -u tools/compare_intersectors.py scenes/teapot.txt [depth]
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

from radish_pt_tpu.render import pathtrace as pt
from radish_pt_tpu.sampling import rng
from radish_pt_tpu.scene import build as sbuild
from radish_pt_tpu.scene import device_scene as dsc
from radish_pt_tpu.scene.parser import parse_scene


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1).view(np.uint8)[0])


def _run(f, *args, n_warm=1, n_iter=3):
    for _ in range(n_warm):
        sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot.txt"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    desc = parse_scene(scene_path)

    for isector in ("pallas_mxu", "pallas_brute"):
        ds, cam = sbuild.build_device_scene(desc)
        ds = ds.replace(intersector=isector)
        n = cam.width * cam.height
        idx = jnp.arange(n, dtype=jnp.int32)
        sampler0 = rng.make_sampler(7, idx)
        ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
        it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
        key = jax.random.PRNGKey(0)
        sec_d = jax.random.normal(key, (n, 3))
        sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)
        pos = it.pos

        t_coh = _run(jax.jit(lambda o, d: dsc.intersect(ds, o, d).prim_id),
                     ray_o, ray_d)
        t_div = _run(jax.jit(lambda o, d: dsc.intersect(ds, o, d).prim_id),
                     pos + sec_d * 1e-4, sec_d)
        t_srt = _run(jax.jit(lambda o, d: dsc.intersect_sorted(ds, o, d).prim_id),
                     pos + sec_d * 1e-4, sec_d)
        t_frame = _run(jax.jit(lambda lo: pt.path_trace(ds, cam, lo, depth)), 7)
        print(f"{isector:14s} tris={ds.num_triangles}  primary={t_coh:8.1f} ms  "
              f"divergent={t_div:8.1f} ms  sorted={t_srt:8.1f} ms  "
              f"frame(d{depth})={t_frame:8.1f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Full-frame A/B of one dispatch knob on the real path_trace loop.

Times N frames of path_trace (honest one-element sync) for each variant:
  sphere : _SCAN_SPHERE_MIN_C as shipped (sphere prepass above 384 clusters)
  slab   : _SCAN_SPHERE_MIN_C = 1e9 (always the [rays, C] slab prepass)

Usage: python -u tools/frame_ab.py scenes/teapot_hires.txt [depth] [engine]
(engine: pallas_mxu | pallas_quad | pallas_compact — forces the
intersector instead of the sphere/slab A/B)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from radish_pt_tpu.accel import pallas_kernels as pk  # noqa: E402
from radish_pt_tpu.render import pathtrace as pt  # noqa: E402
from radish_pt_tpu.scene import build as sbuild  # noqa: E402
from radish_pt_tpu.scene.parser import parse_scene  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def time_frames(step, n_warm=2, n_iter=6):
    for i in range(n_warm):
        _sync(step(i))
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(n_warm + i)
    _sync(out)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    engine = sys.argv[3] if len(sys.argv) > 3 else None
    ds, cam = sbuild.build_device_scene(parse_scene(scene_path))
    print(f"scene={scene_path} tris={ds.num_triangles} depth={depth} "
          f"intersector={ds.intersector}", flush=True)

    if engine is not None:
        if engine != ds.intersector:
            # build-time stacked coeffs belong to the default engine
            ds = ds.replace(intersector=engine, sweep_coeffs=None,
                            sweep_center=None)
        step = jax.jit(lambda looper: pt.path_trace(ds, cam, looper, depth))
        ms = time_frames(step)
        print(f"  {engine:14s}: {ms:8.2f} ms/frame", flush=True)
        return

    shipped = pk._SCAN_SPHERE_MIN_C
    for name, thr in (("sphere", shipped), ("slab", 1 << 30)):
        pk._SCAN_SPHERE_MIN_C = thr
        # the threshold is read at trace time inside the inner jits —
        # bust their trace caches so the knob actually applies
        pk.intersect_plucker_pallas.clear_cache()
        pk.occlusion_plucker_pallas.clear_cache()
        step = jax.jit(lambda looper: pt.path_trace(ds, cam, looper, depth))
        ms = time_frames(step)
        print(f"  {name:8s} (_SCAN_SPHERE_MIN_C={thr}): {ms:8.2f} ms/frame",
              flush=True)
    pk._SCAN_SPHERE_MIN_C = shipped


if __name__ == "__main__":
    main()

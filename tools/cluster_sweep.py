#!/usr/bin/env python
"""Sweep the cull-cluster size on real frames (TPU).

Justifies accel/pallas_kernels.cluster_sub_for: cluster size trades per-op
fixed cost (grid steps, branches, M-stream latency) against row-union pair
waste, and the optimum grows with scene size.  Round-3 measurements
(800x800 depth-5 frames, v5e):

    teapot (4.9k tris):   64 -> 157 ms   128 -> 151   256 -> 186   512 -> 223
    glass (7.9k):         64 -> 245      128 -> 252
    teapot_hires (112k):  64 -> 786      128 -> 709   256 -> 683   512 -> 644

The mean-radiance column guards against result corruption (a fixed-width
winner key once silently broke above 64 tris — caught by this sweep).

Usage: python tools/cluster_sweep.py SCENE_NAME SUB[,SUB...] [depth]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

from radish_pt_tpu.accel import pallas_kernels as pk  # noqa: E402


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    subs = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "64,128").split(",")]
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from radish_pt_tpu.render import pathtrace as pt
    from radish_pt_tpu.scene.build import load_scene

    for sub in subs:
        pk.CLUSTER_SUB = sub  # build.py resolves through cluster_sub_for;
        import os

        os.environ["RADISH_CLUSTER_SUB"] = str(sub)
        ds, cam, _ = load_scene(f"scenes/{scene}.txt")
        cam = cam.replace(width=800, height=800)
        fn = jax.jit(lambda ds, cam, looper: pt.path_trace(ds, cam, looper, depth))
        sync(fn(ds, cam, 0))
        sync(fn(ds, cam, 1))
        n_it = 3 if ds.num_triangles > 50000 else 5
        t0 = time.perf_counter()
        for i in range(n_it):
            o = fn(ds, cam, 2)
        sync(o)
        ms = (time.perf_counter() - t0) / n_it * 1e3
        d, ind = fn(ds, cam, 7)
        mean = float((np.asarray(d) + np.asarray(ind)).mean())
        print(f"[{scene}] sub={sub}: {ms:.2f} ms/frame  mean={mean:.5f}",
              flush=True)


if __name__ == "__main__":
    main()

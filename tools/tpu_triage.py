#!/usr/bin/env python
"""One-shot TPU tuning sweep — run when the tunnel is up to gather every
round-3-relevant measurement in a single session:

  timeout 3000 python -u tools/tpu_triage.py [--quick]

Prints a table of: per-scene frame times (cornell/teapot/glass/many_light/
teapot_hires), compact-vs-dense engine A/B, compact (group, work_per_row)
A/B, sorted-vs-raster primaries A/B, and batched-ReSTIR steady state.
Everything uses the honest one-element sync (block_until_ready does not
block through the tunnel)."""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timeit(fn, n_warm=2, n_iter=4):
    for i in range(n_warm):
        _sync(fn(i))
    t0 = time.perf_counter()
    out = None
    for i in range(n_iter):
        out = fn(n_warm + i)
    _sync(out)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="256^2, fewer iters")
    ap.add_argument("--skip-scenes", action="store_true")
    ap.add_argument("--res", type=int, default=None, help="override resolution")
    args = ap.parse_args()
    res = args.res or (256 if args.quick else 800)
    n_iter = 2 if args.quick else 4

    from functools import partial

    from radish_pt_tpu.render import pathtrace as pt
    from radish_pt_tpu.scene.build import load_scene
    from radish_pt_tpu.scene import device_scene as dscene

    print(f"backend: {jax.devices()[0].platform}, res {res}^2", flush=True)

    def frame_ms(ds, cam, depth=5):
        fn = jax.jit(lambda ds, cam, looper: pt.path_trace(ds, cam, looper, depth))
        return timeit(lambda i: fn(ds, cam, i), n_iter=n_iter)

    scenes = {}
    for name in ("cornell_box", "teapot", "glass", "many_light", "teapot_hires"):
        try:
            ds, cam, _ = load_scene(f"scenes/{name}.txt")
        except FileNotFoundError:
            continue
        scenes[name] = (ds, cam.replace(width=res, height=res))

    if not args.skip_scenes:
        print("\n== per-scene full-PT frame (depth 5) ==", flush=True)
        for name, (ds, cam) in scenes.items():
            try:
                ms = frame_ms(ds, cam)
                mrays = res * res * 11 / ms / 1e3
                print(f"  {name:14s} {ms:8.2f} ms  {mrays:6.1f} Mrays/s "
                      f"[{ds.intersector}]", flush=True)
            except Exception as e:
                print(f"  {name:14s} FAILED: {type(e).__name__}: {e}", flush=True)

    # engine A/B on teapot + hires
    print("\n== engine A/B (same scene, forced intersector) ==", flush=True)
    for name in ("teapot", "teapot_hires"):
        if name not in scenes:
            continue
        ds, cam = scenes[name]
        for engine in ("pallas_mxu", "pallas_quad", "pallas_compact"):
            try:
                ms = frame_ms(ds.replace(intersector=engine), cam)
                print(f"  {name:14s} {engine:15s} {ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"  {name:14s} {engine:15s} FAILED: {e}", flush=True)

    # compact (group, budget, fan) sweep on primaries — hires (the >65k
    # engine) AND teapot (can compact+fan replace the dense scan mid-scale?)
    from radish_pt_tpu.accel.pallas_kernels import intersect_plucker_compact
    from radish_pt_tpu.sampling import rng

    for sname in ("teapot_hires", "teapot"):
        if sname not in scenes:
            continue
        print(f"\n== compact (group, wpr, fan) on {sname} ==", flush=True)
        ds, cam = scenes[sname]
        n = res * res
        idx = jnp.arange(n, dtype=jnp.int32)
        ray_o, ray_d, _ = jax.jit(pt._gen_primary)(
            ds, cam, rng.make_sampler(3, idx), idx)
        wprs = (40, 64) if sname == "teapot_hires" else (24, 40)
        for group in (1, 2, 4, 8):
            for wpr in wprs:
                for fan in (1, 4):
                    try:
                        fn = jax.jit(partial(
                            intersect_plucker_compact,
                            tri_order=ds.tri_order,
                            cluster_bounds=ds.cluster_bounds,
                            group=group, work_per_row=wpr, fan=fan,
                        ))
                        ms = timeit(lambda i: fn(ds.tri_packed, ray_o, ray_d),
                                    n_iter=n_iter)
                        print(f"  group={group} wpr={wpr} fan={fan}: "
                              f"{ms:7.2f} ms/sweep", flush=True)
                    except Exception as e:
                        print(f"  group={group} wpr={wpr} fan={fan}: "
                              f"FAILED {e}", flush=True)

    # sorted vs raster primaries
    print("\n== primary sorting A/B ==", flush=True)
    for name in ("teapot", "glass", "teapot_hires"):
        if name not in scenes:
            continue
        ds, cam = scenes[name]
        for flag in (True, False):
            try:
                ms = frame_ms(ds.replace(sort_primaries=flag), cam)
                print(f"  {name:14s} sort_primaries={flag}: {ms:8.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"  {name:14s} sort_primaries={flag}: FAILED {e}",
                      flush=True)

    # batched ReSTIR steady state
    if "cornell_box" in scenes:
        print("\n== batched ReSTIR (cornell) ==", flush=True)
        from radish_pt_tpu.config import ReservoirReuse
        from radish_pt_tpu.render import restir as rs
        from radish_pt_tpu.render.renderer import _restir_batch

        ds, cam = scenes["cornell_box"]
        n = res * res
        block = 8
        bfn = jax.jit(partial(
            _restir_batch, reuse=ReservoirReuse.TEMPORAL_SPATIAL,
            reservoir_size=32, clamp=20, encode_normal=False, block=block,
        ), donate_argnums=(7,))
        from radish_pt_tpu.render import gbuffer as gb

        state = {
            "res": rs.empty_reservoir(n),
            "direct": jnp.zeros((n, 3), jnp.float32),
            "last": gb.empty_frame(n),
            "first": True,
        }

        def step(i):
            d, r, g = bfn(ds, cam, cam, i * block, state["last"],
                          state["res"], jnp.asarray(state["first"]),
                          state["direct"], i * block)
            state.update(res=r, direct=d, last=g.frame, first=False)
            return d

        ms = timeit(step, n_warm=1, n_iter=2) / block
        print(f"  steady-state {ms:.2f} ms/frame (x{block} batch)", flush=True)


if __name__ == "__main__":
    main()

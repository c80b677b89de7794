#!/usr/bin/env python
"""A/B the compacted work-list kernels vs the chunk-scan kernels.

Usage: python -u tools/ab_compact.py [scene.txt] [work_per_row]
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
    print(f"  {name:52s} {ms:9.2f} ms   (k1={t1:.1f} k{KHI}={thi:.1f})",
          flush=True)
    return ms


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot.txt"
    wpr = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    grp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    desc = parse_scene(scene_path)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    print(f"scene={scene_path} tris={ds.num_triangles} lanes={n} wpr={wpr} grp={grp}",
          flush=True)

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    pos = jnp.asarray(jax.device_get(it.pos))
    key = jax.random.PRNGKey(0)
    sec_d = jax.random.normal(key, (n, 3))
    sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)
    skey = np.asarray(dsc._sort_key(ds, pos, sec_d))
    perm = np.argsort(skey)
    o_s = jnp.asarray(np.asarray(pos)[perm])
    d_s = jnp.asarray(np.asarray(sec_d)[perm])
    cb = ds.cluster_bounds
    y_div = o_s + d_s * 2.0
    z = jnp.zeros(n)

    # report flag statistics + the work-budget hit rate
    rows = (-(-n // 1024)) * 1024 // (128 * grp)
    flags = jax.jit(
        lambda o, d: pk._row_flags(cb, o, d, None, rows, lanes=128 * grp)
    )(jnp.pad(o_s, ((0, rows * 128 * grp - n), (0, 0))),
      jnp.pad(d_s, ((0, rows * 128 * grp - n), (0, 0)), constant_values=1.0))
    per_row = np.asarray(jnp.sum(flags, axis=1))
    total = int(per_row.sum())
    print(f"  flags: total={total} mean/row={per_row.mean():.2f} "
          f"p95={np.percentile(per_row, 95):.0f} max={per_row.max()} "
          f"budget={rows * wpr} over={'YES' if total > rows * wpr else 'no'}",
          flush=True)

    def scan_div(c):
        return pk.intersect_plucker_pallas(
            ds.tri_packed, o_s + c[:, None], d_s, cluster_bounds=cb)[1]

    def comp_div(c):
        return pk.intersect_plucker_compact(
            ds.tri_packed, o_s + c[:, None], d_s, cluster_bounds=cb,
            work_per_row=wpr, group=grp)[1]

    def scan_occ(c):
        return pk.occlusion_plucker_pallas(
            ds.tri_packed, o_s + c[:, None], y_div,
            cluster_bounds=cb).astype(jnp.float32)

    def comp_occ(c):
        return pk.occlusion_plucker_compact(
            ds.tri_packed, o_s + c[:, None], y_div,
            cluster_bounds=cb, work_per_row=wpr,
            group=grp).astype(jnp.float32)

    def scan_coh(c):
        return pk.intersect_plucker_pallas(
            ds.tri_packed, ray_o + c[:, None], ray_d, cluster_bounds=cb)[1]

    def comp_coh(c):
        return pk.intersect_plucker_compact(
            ds.tri_packed, ray_o + c[:, None], ray_d, cluster_bounds=cb,
            work_per_row=wpr, group=grp)[1]

    slope("scan closest (sorted divergent)", scan_div, z)
    slope("compact closest (sorted divergent)", comp_div, z)
    slope("scan occlusion (sorted divergent)", scan_occ, z)
    slope("compact occlusion (sorted divergent)", comp_occ, z)
    slope("scan closest (coherent primaries)", scan_coh, z)
    slope("compact closest (coherent primaries)", comp_coh, z)


if __name__ == "__main__":
    main()

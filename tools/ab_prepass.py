#!/usr/bin/env python
"""Decompose the big-scene scan sweep: XLA slab mask prepass vs MXU sphere
prepass vs coefficient prep vs the kernel itself.

Run: timeout 1800 python -u tools/ab_prepass.py [scene]
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
    desc = parse_scene(scene)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    C = ds.cluster_bounds.shape[0]
    print(f"scene={scene} tris={ds.num_triangles} lanes={n} C={C}",
          flush=True)

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    key = jax.random.PRNGKey(0)
    # realistic first-bounce wavefront: cosine-hemisphere around the shading
    # normal at the primary hit (what a Lambertian bounce actually traces),
    # dead lanes (primary misses) excluded via the live mask below
    from radish_pt_tpu.utils import math as m

    r2 = jax.random.uniform(key, (n, 2))
    sec_d = jax.jit(m.cosine_sample_hemisphere)(it.norm, r2[:, 0], r2[:, 1])
    live = np.asarray(it.prim_id) >= 0
    print(f"live lanes after primary: {live.mean():.3f}", flush=True)
    sec_o = it.pos + sec_d * 1e-5
    skey = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))(sec_o, sec_d)
    skey = skey + jnp.where(jnp.asarray(live), 0, dsc._DEAD_KEY_BIT)
    order = jnp.argsort(skey)
    sec_o = jnp.asarray(jax.device_get(sec_o[order]))
    sec_d = jnp.asarray(jax.device_get(sec_d[order]))

    n_pad = -(-n // pk.RAY_BLOCK) * pk.RAY_BLOCK
    n_blocks = n_pad // pk.RAY_BLOCK
    sub, tri_chunk, t_pad = pk._chunking(ds.num_triangles)
    n_chunks = t_pad // tri_chunk
    spc = tri_chunk // sub
    print(f"tri_chunk={tri_chunk} n_chunks={n_chunks} subs/chunk={spc} "
          f"steps={n_chunks * n_blocks}", flush=True)

    # 1. XLA slab mask prepass (what the scan kernel uses today)
    f_slab = jax.jit(lambda o, d: pk._cluster_mask_bits(
        ds.cluster_bounds, o, d, None, n_blocks, n_chunks, spc))
    ms = timeit(f_slab, sec_o, sec_d)
    print(f"slab mask prepass [{n}x{C}]:        {ms:8.2f} ms", flush=True)

    # 2. MXU sphere prepass at the same (128-lane row) granularity
    tp = ds.tri_packed if ds.tri_order is None else ds.tri_packed[ds.tri_order]
    v0 = tp[:, 0:3]
    center = 0.5 * (v0.min(axis=0) + v0.max(axis=0))
    rows = n_pad // 128

    def f_sphere(o, d):
        o_p, d_p, tm_p = pk._pad_rays(o, d, None, n_pad)
        return pk._sphere_flags(ds.cluster_bounds, center, o_p - center,
                                d_p, tm_p, rows, lanes=128)

    ms = timeit(jax.jit(f_sphere), sec_o, sec_d)
    print(f"sphere flags [{rows}x{C}] (128-lane): {ms:8.2f} ms", flush=True)

    # flag-count comparison (sphere superset looseness)
    slab_rows = jax.jit(lambda o, d: pk._row_flags(
        ds.cluster_bounds, *pk._pad_rays(o, d, None, n_pad), rows,
        lanes=128))(sec_o, sec_d)
    sph_rows = jax.jit(f_sphere)(sec_o, sec_d)
    print(f"flags/row: slab {float(slab_rows.sum()) / rows:.1f}  "
          f"sphere {float(sph_rows.sum()) / rows:.1f}", flush=True)

    # 3. coefficient prep (permute + coeffs + stack), per sweep
    def f_coeff(tp):
        tpp = tp if ds.tri_order is None else tp[ds.tri_order]
        c = pk._plucker_coeffs(
            tpp, center, jnp.arange(ds.num_triangles, dtype=jnp.int32))[0:4]
        c = jnp.pad(c, ((0, 0), (0, t_pad - ds.num_triangles), (0, 0)))
        return pk._stack4(c, sub, False)

    ms = timeit(jax.jit(f_coeff), ds.tri_packed)
    print(f"coeff prep [{t_pad}]:                {ms:8.2f} ms", flush=True)

    # 4. whole raw sweep for reference (live-masked like the real frame)
    live_s = jnp.asarray(np.asarray(live)[np.asarray(jax.device_get(order))])
    tmax_live = jnp.where(live_s, pk.FLT_MAX, -pk.FLT_MAX)
    f_raw = jax.jit(lambda o, d, tm: pk.intersect_plucker_pallas(
        ds.tri_packed, o, d, tri_order=ds.tri_order,
        cluster_bounds=ds.cluster_bounds, tmax=tm)[1])
    ms = timeit(f_raw, sec_o, sec_d, tmax_live)
    print(f"sorted live bounce sweep:           {ms:8.2f} ms", flush=True)

    # 5. sort key cost (the [N, <=256] signature slab test)
    f_key = jax.jit(lambda o, d: dsc._sort_key(ds, o, d))
    ms = timeit(f_key, sec_o, sec_d)
    print(f"signature sort key:                 {ms:8.2f} ms", flush=True)

    # 6. cull-granularity curve: exact slab flags per group at 1/8/32/128
    # lanes on the LIVE sorted bounce wavefront — the decision datum for
    # any sub-row work-assignment design (how much of the 128-lane row
    # union is actually reducible).
    n_live = int(live_s.sum())
    print(f"granularity curve (live lanes only, {n_live}):", flush=True)
    for lanes in (128, 32, 8, 1):
        rowsL = n_pad // lanes

        def f_cnt(o, d, tm):
            fl = pk._row_flags(ds.cluster_bounds, o, d, tm, rowsL,
                               lanes=lanes)
            return fl.sum(dtype=jnp.int32)

        o_p, d_p, tm_p = pk._pad_rays(sec_o, sec_d, None, n_pad)
        tm_p = jnp.where(jnp.pad(live_s, (0, n_pad - n)), tm_p, -pk.FLT_MAX)
        cnt = int(jax.jit(f_cnt)(o_p, d_p, tm_p))
        groups_hit = max(1, int(jnp.ceil(live_s.sum() / lanes)))
        print(f"  lanes={lanes:4d}: {cnt:9d} flags  "
              f"{cnt / (rowsL):7.2f}/group  "
              f"{cnt * lanes / max(n_live, 1):7.2f} per-live-lane-equiv",
              flush=True)


if __name__ == "__main__":
    main()

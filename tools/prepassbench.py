#!/usr/bin/env python
"""A/B the scan engine's cull-mask prepass: XLA slab test vs MXU sphere
kernel, at real scene shapes (teapot / teapot_hires bounce wavefronts).

Measures (slope-timed, tunnel-aware):
  1. _cluster_mask_bits   — current [N, C] slab prepass
  2. sphere-based variant — _sphere_flags + the same bit packing
and reports the FLAG RATIO (sphere flags / slab flags, row-level), which
bounds the sweep-cost increase the looser sphere test would cause.

Run: python -u tools/prepassbench.py [scene.txt]
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

from radish_pt_tpu.accel import pallas_kernels as pk  # noqa: E402
from radish_pt_tpu.scene import device_scene as dsc  # noqa: E402
from radish_pt_tpu.scene.parser import parse_scene  # noqa: E402
from radish_pt_tpu.scene import build as sbuild  # noqa: E402

N = 640_000


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1).view(np.uint8)[0])


def slope(name, fn, *args, khi=6, n_iter=3):
    def rep(k):
        def f(*s):
            def body(i, c):
                out = fn(c, *s[1:])
                return c + out * 1e-30
            return jax.lax.fori_loop(0, k, body, s[0])
        return jax.jit(f)

    def run(f):
        for _ in range(2):
            sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f(*args)
        sync(out)
        return (time.perf_counter() - t0) / n_iter * 1e3

    t1 = run(rep(1))
    tk = run(rep(khi))
    ms = (tk - t1) / (khi - 1)
    print(f"  {name:44s} {ms:8.2f} ms   (k1={t1:.1f} k{khi}={tk:.1f})",
          flush=True)
    return ms


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
    scene = parse_scene(scene_path)
    ds, _cams = sbuild.build_device_scene(scene)
    cb = ds.cluster_bounds
    C = cb.shape[0]
    T = ds.tri_packed.shape[0]
    print(f"scene={scene_path} tris={T} clusters={C} lanes={N}", flush=True)

    sub, tri_chunk, t_pad = pk._chunking(T)
    n_blocks = -(-N // pk.RAY_BLOCK)
    n_chunks = t_pad // tri_chunk
    subs = tri_chunk // sub
    rows = n_blocks * (pk.RAY_BLOCK // 128)

    # bounce-like rays: origins spread inside the scene box, random dirs
    rng = np.random.default_rng(0)
    lo = np.asarray(cb[:, 0:3].min(axis=0))
    hi = np.asarray(cb[:, 3:6].max(axis=0))
    o = jnp.asarray(
        lo + (hi - lo) * rng.random((N, 3), np.float32), jnp.float32
    )
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    center = jnp.asarray(0.5 * (lo + hi))

    def slab_bits(c, o, d):
        o = o + c * 1e-30  # carry dependency: stop XLA hoisting the body
        m = pk._cluster_mask_bits(cb, o, d, None, n_blocks, n_chunks, subs)
        return c + m.sum() * 1e-30

    def sphere_bits(c, o, d):
        o = o + c * 1e-30  # carry dependency: stop XLA hoisting the body
        n_pad = n_blocks * pk.RAY_BLOCK
        op, dp, tm = pk._pad_rays(o, d, None, n_pad)
        flags = pk._sphere_flags(cb, center, op - center, dp, tm, rows, 128)
        pad_c = n_chunks * subs - C
        f = jnp.pad(flags[:, :C], ((0, 0), (0, pad_c)))
        bits = f.reshape(rows, n_chunks, subs).astype(jnp.int32)
        w = (1 << jnp.arange(subs, dtype=jnp.int32))[None, None]
        m = jnp.sum(bits * w, axis=-1, dtype=jnp.int32)
        return c + m.sum() * 1e-30

    x0 = jnp.zeros((), jnp.float32)
    print("--- prepass marginal cost ---", flush=True)
    slope(f"slab _cluster_mask_bits  [N,{C}]", slab_bits, x0, o, d)
    slope(f"sphere _sphere_flags     [N,{C}]", sphere_bits, x0, o, d)

    # flag-tightness: row-level flagged-cluster counts
    n_pad = n_blocks * pk.RAY_BLOCK
    op, dp, tm = pk._pad_rays(o, d, None, n_pad)
    f_slab = np.asarray(
        jax.jit(pk._row_flags, static_argnames=("rows", "lanes"))(
            cb, op, dp, tm, rows
        )
        if C <= 4096 else np.zeros((1, 1), bool)
    )
    f_sph = np.asarray(
        jax.jit(pk._sphere_flags, static_argnames=(
            "rowblks", "lanes", "interpret", "with_tn"))(
            cb, center, op - center, dp, tm, rowblks=rows, lanes=128)
    )
    if f_slab.size > 1:
        ns, np_ = f_slab.sum(axis=1).mean(), f_sph[:, :f_slab.shape[1]].sum(axis=1).mean()
        print(f"row-union flagged clusters: slab {ns:.1f}  sphere {np_:.1f} "
              f"(x{np_ / max(ns, 1e-9):.2f})", flush=True)
        miss = (f_slab & ~f_sph[:, :f_slab.shape[1]]).sum()
        print(f"slab-flagged but sphere-missed rows*clusters: {miss} "
              f"(must be 0)", flush=True)


if __name__ == "__main__":
    main()

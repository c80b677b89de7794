#!/usr/bin/env python
"""Decompose one sorted intersect pass into its parts (TPU timings).

Times key / fwd sort / sweep / inverse sort / surface recovery standalone
(k1 column ~= dispatch+sync floor plus the part) on a real bounce-1
wavefront — the attribution tool behind BASELINE.md round-3's frame
budgets.  Usage: python tools/pass_decompose.py scenes/teapot.txt
"""

import os, sys, time
import numpy as np
sys.path.insert(0, ".")
from radish_pt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
os.environ["RADISH_INTERSECTOR"] = "pallas_mxu"
from radish_pt_tpu.scene.build import load_scene
from radish_pt_tpu.scene import device_scene as dsc
from radish_pt_tpu.render import pathtrace as pt
from radish_pt_tpu.sampling import rng as rngm
from radish_pt_tpu.bsdf import materials as bsdf
from radish_pt_tpu.utils import math as m
from radish_pt_tpu.accel import pallas_kernels as pk

scene = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot.txt"
res = 800
ds, cam, _ = load_scene(scene)
cam = cam.replace(width=res, height=res)
n = res * res
idx = jnp.arange(n, dtype=jnp.int32)
sampler = rngm.make_sampler(7, idx)
ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, idx)
isect = jax.jit(lambda o, d: dsc.intersect(ds, o, d))
it = isect(ray_o, ray_d)
hit = it.prim_id != -1
mat, norm = dsc.get_textured_material(ds, it.mat_id, it.uv, it.norm)
active = hit & (mat.mtype != dsc.MAT_LIGHT)
wo = -ray_d
is_delta = mat.mtype == dsc.MAT_DIELECTRIC
flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
norm = jnp.where(flip[..., None], -norm, norm)
r3, sampler = rngm.sample_3d(ds.sobol, sampler)
samp = jax.jit(bsdf.bsdf_sample)(mat, norm, wo, r3)
active = active & ~(bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8))
ray_d2 = samp.dir
ray_o2 = it.pos + ray_d2 * 1e-5
args = [jax.device_put(x) for x in (ray_o2, ray_d2, active)]
jax.block_until_ready(args)

KHI = 8
def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))

def slope(name, builder):
    def rep(k):
        def f(o, d, a):
            out = None
            for i in range(k):
                out = builder(o + i * 0e-9, d, a)
            return out
        return jax.jit(f)
    def run(f):
        for _ in range(2): sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(4): out = f(*args)
        sync(out)
        return (time.perf_counter() - t0) / 4 * 1e3
    t1, t8 = run(rep(1)), run(rep(KHI))
    print(f"  {name:34s} {(t8 - t1) / (KHI - 1):7.2f} ms  (k1={t1:.1f} k8={t8:.1f})", flush=True)

slope("full intersect_sorted", lambda o, d, a: dsc.intersect_sorted(ds, o, d, active=a).pos)
slope("sort key only", lambda o, d, a: dsc._sort_key(ds, o, d))
def fwd(o, d, a):
    key = dsc._sort_key(ds, o, d) + jnp.where(a, 0, dsc._DEAD_KEY_BIT)
    lane = jnp.arange(o.shape[0], dtype=jnp.int32)
    s = jax.lax.sort((key, lane, o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2]), num_keys=1)
    return s[1]
slope("key + fwd sort (8 col)", fwd)
pre = dict(coeffs_pre=ds.sweep_coeffs, center_pre=ds.sweep_center) \
    if ds.sweep_coeffs is not None else {}
def sweep_only(o, d, a):
    tm = jnp.where(a, pk.FLT_MAX, -pk.FLT_MAX)
    p, t = pk.intersect_plucker_pallas(ds.tri_packed, o, d,
        cluster_bounds=ds.cluster_bounds, tmax=tm, **pre)
    return p
slope("sweep only (unsorted rays)", sweep_only)
def inv(o, d, a):
    lane = jnp.arange(o.shape[0], dtype=jnp.int32)
    prim = lane
    u = jax.lax.sort((lane, prim), num_keys=1)
    return u[1]
slope("inverse sort (2 col)", inv)
def surf(o, d, a):
    pos, nrm, uv, mid = dsc.surface_info_from_t(ds, jnp.abs(idx) % ds.tri_attr.shape[0], o, d)
    return pos
slope("surface_info_from_t", surf)

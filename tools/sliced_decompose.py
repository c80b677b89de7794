#!/usr/bin/env python
"""Decompose the SLICED compact bounce loop's frame budget (TPU timings).

Times each structural piece of render/pathtrace.py::_sliced_bounce_loop
standalone with slope timing (k-replication cancels the ~20 ms tunnel
dispatch floor) on a REAL bounce-1 wavefront, at both full wavefront width
and one slice width S = N / n_slices:

  primary sorted intersect | peel NEE (shadow sort + occlusion) |
  peel BSDF | ext signature key ([N,C] slab prepass) |
  16-col global sort | slice sweep (intersect_ids) |
  slice surface fetch | slice NEE | slice BSDF+key | 4-col delivery sort

Usage: python tools/sliced_decompose.py [scenes/teapot_hires.txt] [res]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from radish_pt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from radish_pt_tpu.bsdf import materials as bsdf  # noqa: E402
from radish_pt_tpu.render import pathtrace as pt  # noqa: E402
from radish_pt_tpu.sampling import rng as rngm  # noqa: E402
from radish_pt_tpu.scene import device_scene as dsc  # noqa: E402
from radish_pt_tpu.scene.build import load_scene  # noqa: E402
from radish_pt_tpu.utils import math as m  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "scenes/teapot_hires.txt"
res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
N_SLICES = 8

ds, cam, _ = load_scene(scene)
cam = cam.replace(width=res, height=res)
n = res * res
S = -(-n // N_SLICES)

# ---- build a real bounce-1 wavefront (tile-ordered primaries) ----
perm, _ = pt._tiled_lanes(ds, cam, None)
idx = perm if perm is not None else jnp.arange(n, dtype=jnp.int32)
sampler = rngm.make_sampler(7, idx)
ray_o, ray_d, sampler = jax.jit(pt._gen_primary)(ds, cam, sampler, idx)
it = jax.jit(lambda o, d: dsc.intersect_primary(ds, o, d))(ray_o, ray_d)
mat, norm = jax.jit(dsc.get_textured_material)(ds, it.mat_id, it.uv, it.norm)
active = (it.prim_id != -1) & (mat.mtype != dsc.MAT_LIGHT)
wo = -ray_d
is_delta = mat.mtype == dsc.MAT_DIELECTRIC
flip = (~is_delta) & (m.dot(norm, wo) < 0.0)
norm = jnp.where(flip[..., None], -norm, norm)
r3, sampler = rngm.sample_3d(ds.sobol, sampler)
samp = jax.jit(lambda mat, norm, wo, r3: bsdf.bsdf_sample(
    mat, norm, wo, r3, types=ds.mat_types))(mat, norm, wo, r3)
active = active & ~(bsdf.is_invalid(samp.type) | (samp.pdf < 1e-8))
d2 = samp.dir
o2 = it.pos + d2 * 1e-5
pos = it.pos

args_full = [jax.device_put(x) for x in (o2, d2, active, pos, norm)]
args_slice = [x[:S] for x in args_full]
jax.block_until_ready(args_full)
jax.block_until_ready(args_slice)

print(f"{scene}: n={n} S={S} live_b1={int(np.asarray(active).sum())} "
      f"C={ds.cluster_bounds.shape[0] if ds.cluster_bounds is not None else 0}",
      flush=True)

KHI = 8


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(name, builder, args):
    def rep(k):
        def f(o, d, a, p, nm):
            out = None
            for i in range(k):
                out = builder(o + i * 0e-9, d, a, p, nm)
            return out
        return jax.jit(f)

    def run(f):
        for _ in range(2):
            sync(f(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(4):
            out = f(*args)
        sync(out)
        return (time.perf_counter() - t0) / 4 * 1e3

    t1, t8 = run(rep(1)), run(rep(KHI))
    print(f"  {name:40s} {(t8 - t1) / (KHI - 1):7.2f} ms  "
          f"(k1={t1:.1f} k8={t8:.1f})", flush=True)


# ---- full-wavefront pieces ----
slope("primary sorted intersect [N]",
      lambda o, d, a, p, nm: dsc.intersect_primary(ds, ray_o + o * 0, ray_d).pos,
      args_full)
slope("NEE sample+occl (sorted) [N]",
      lambda o, d, a, p, nm: dsc.sample_direct_light(
          ds, p, jnp.stack([o[:, 0] * 0 + 0.3] * 4, -1), mask=a,
          shade_normal=nm)[0],
      args_full)
slope("ext sig key [N,C] slab",
      lambda o, d, a, p, nm: dsc._sort_key(ds, o, d), args_full)


def sort16(o, d, a, p, nm):
    key = dsc._sort_key(ds, o, d) + jnp.where(a, 0, dsc._DEAD_KEY_BIT)
    z = o[:, 0]
    lane = jnp.arange(o.shape[0], dtype=jnp.int32)
    s = jax.lax.sort((key, lane, lane, z, z, z, z, z, z,
                      o[:, 0], o[:, 1], o[:, 2],
                      d[:, 0], d[:, 1], d[:, 2], z), num_keys=1)
    return s[9]


slope("key + 16-col global sort [N]", sort16, args_full)
slope("sweep intersect_ids [N]",
      lambda o, d, a, p, nm: dsc.intersect_ids(ds, o, d, a)[0], args_full)
slope("surface_from_ids [N]",
      lambda o, d, a, p, nm: dsc.surface_from_ids(
          ds, jnp.abs(jnp.arange(o.shape[0])) % ds.tri_attr.shape[0],
          None, o, d)[0],
      args_full)


def deliver4(o, d, a, p, nm):
    lane = jnp.arange(o.shape[0], dtype=jnp.int32)
    u = jax.lax.sort((lane, o[:, 0], o[:, 1], o[:, 2]), num_keys=1)
    return u[1]


slope("4-col delivery sort [N]", deliver4, args_full)

# ---- slice-width pieces ----
slope("sweep intersect_ids [S]",
      lambda o, d, a, p, nm: dsc.intersect_ids(ds, o, d, a)[0], args_slice)
slope("surface_from_ids [S]",
      lambda o, d, a, p, nm: dsc.surface_from_ids(
          ds, jnp.abs(jnp.arange(o.shape[0])) % ds.tri_attr.shape[0],
          None, o, d)[0],
      args_slice)
slope("NEE sample+occl (sorted) [S]",
      lambda o, d, a, p, nm: dsc.sample_direct_light(
          ds, p, jnp.stack([o[:, 0] * 0 + 0.3] * 4, -1), mask=a,
          shade_normal=nm)[0],
      args_slice)
slope("BSDF sample [S]",
      lambda o, d, a, p, nm: bsdf.bsdf_sample(
          mat if o.shape[0] == n else jax.tree_util.tree_map(
              lambda x: x[:S], mat),
          nm, -d, jnp.stack([o[:, 0] * 0 + 0.3] * 3, -1),
          types=ds.mat_types).dir,
      args_slice)
slope("ext sig key [S,C] slab",
      lambda o, d, a, p, nm: dsc._sort_key(ds, o, d), args_slice)

#!/usr/bin/env python
"""Per-slice budget of the sliced bounce loop at a real bounce-1 wavefront.

For each slice offset j of the signature-sorted extension wavefront, times
the slice's sweep standalone; also times realistic NEE (random r4, sorted
occlusion) and the full-width sweep for comparison.  Answers whether the
sum of slice sweeps exceeds one full-width sweep (per-launch overhead) and
how much NEE really costs per slice.

Usage: python tools/slice_budget.py [scenes/teapot_hires.txt] [n_slices]
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
n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
res = 800
ds, cam, _ = load_scene(scene)
cam = cam.replace(width=res, height=res)
n = res * res
S = -(-n // n_slices)

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

key = jax.jit(lambda o, d, a: dsc._sort_key(ds, o, d)
              + jnp.where(a, 0, dsc._DEAD_KEY_BIT))(o2, d2, active)
s = jax.lax.sort((key, o2[:, 0], o2[:, 1], o2[:, 2],
                  d2[:, 0], d2[:, 1], d2[:, 2],
                  it.pos[:, 0], it.pos[:, 1], it.pos[:, 2],
                  norm[:, 0], norm[:, 1], norm[:, 2]), num_keys=1)
o_s = jnp.stack(s[1:4], axis=-1)
d_s = jnp.stack(s[4:7], axis=-1)
p_s = jnp.stack(s[7:10], axis=-1)
nm_s = jnp.stack(s[10:13], axis=-1)
a_s = s[0] < dsc._DEAD_KEY_BIT
args = [jax.device_put(x) for x in (o_s, d_s, a_s, p_s, nm_s)]
jax.block_until_ready(args)
print(f"{scene}: n={n} S={S} n_slices={n_slices} "
      f"live={int(np.asarray(active).sum())}", flush=True)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def t_ms(fn, *a, iters=6):
    f = jax.jit(fn)
    for _ in range(2):
        sync(f(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(*a)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


full = t_ms(lambda o, d, a, p, nm: dsc.intersect_ids(ds, o, d, a)[0],
            *args)
print(f"  full-width sweep [{n}]: {full:7.2f} ms", flush=True)

tot = 0.0
for j in range(n_slices):
    sl = [x[j * S:(j + 1) * S] for x in args]
    ms = t_ms(lambda o, d, a, p, nm: dsc.intersect_ids(ds, o, d, a)[0],
              *sl)
    tot += ms
    print(f"  slice {j} sweep [{S}]: {ms:7.2f} ms", flush=True)
print(f"  sum of {n_slices} slice sweeps: {tot:7.2f} ms "
      f"(vs full {full:.2f})", flush=True)

# realistic NEE at slice width: fresh random r4 per lane, sorted occlusion
r4 = jax.random.uniform(jax.random.PRNGKey(1), (S, 4))
sl = [x[:S] for x in args]


def nee(o, d, a, p, nm):
    li, wi, lpdf = dsc.sample_direct_light(ds, p, r4, mask=a,
                                           shade_normal=nm)
    return li


print(f"  NEE sample+occl real-r4 [S]: "
      f"{t_ms(nee, *sl):7.2f} ms", flush=True)
r4f = jax.random.uniform(jax.random.PRNGKey(1), (n, 4))


def neef(o, d, a, p, nm):
    li, wi, lpdf = dsc.sample_direct_light(ds, p, r4f, mask=a,
                                           shade_normal=nm)
    return li


print(f"  NEE sample+occl real-r4 [N]: "
      f"{t_ms(neef, *args):7.2f} ms", flush=True)

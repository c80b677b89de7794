#!/usr/bin/env python
"""Sorted-sweep cost + sort-key-quality probe at the CURRENT cluster config.

(a) Times the ext sweep on signature-SORTED bounce-1 rays at full and
slice width — the number the sliced loop actually pays per slice.
(b) Reports row-union cull stats (per-ray floor | current key | widened
key variants | full-mask lexsort ideal) at the kernel's cull granularity,
replayed on the real bounce-1 wavefront.

Usage: python tools/sorted_sweep_ab.py [scenes/teapot_hires.txt]
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
res = 800
ds, cam, _ = load_scene(scene)
cam = cam.replace(width=res, height=res)
n = res * res
S = -(-n // 8)

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

# ---- sort by the shipped signature key ----
key = jax.jit(lambda o, d, a: dsc._sort_key(ds, o, d)
              + jnp.where(a, 0, dsc._DEAD_KEY_BIT))(o2, d2, active)
s = jax.lax.sort((key, o2[:, 0], o2[:, 1], o2[:, 2],
                  d2[:, 0], d2[:, 1], d2[:, 2]), num_keys=1)
o_s = jnp.stack(s[1:4], axis=-1)
d_s = jnp.stack(s[4:7], axis=-1)
a_s = s[0] < dsc._DEAD_KEY_BIT
args = [jax.device_put(x) for x in (o_s, d_s, a_s)]
jax.block_until_ready(args)
print(f"{scene}: n={n} live={int(np.asarray(active).sum())} "
      f"C={ds.cluster_bounds.shape[0]} sub={ds.cluster_sub}", flush=True)


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


ms_full = t_ms(lambda o, d, a: dsc.intersect_ids(ds, o, d, a)[0], *args)
ms_slice = t_ms(lambda o, d, a: dsc.intersect_ids(ds, o, d, a)[0],
                *[x[:S] for x in args])
print(f"  sorted ext sweep [N]: {ms_full:7.2f} ms   [S]: {ms_slice:6.2f} ms",
      flush=True)

# ---- cull-quality stats at kernel granularity ----
cb = ds.cluster_bounds


def flags(o, d, npts=None):
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tn = jnp.full((o.shape[0], cb.shape[0]), -3.4e38)
    tf = jnp.full((o.shape[0], cb.shape[0]), 3.4e38)
    for k in range(3):
        a = (cb[None, :, k] - o[:, k, None]) * inv[:, k, None]
        b = (cb[None, :, 3 + k] - o[:, k, None]) * inv[:, k, None]
        tn = jnp.maximum(tn, jnp.minimum(a, b))
        tf = jnp.minimum(tf, jnp.maximum(a, b))
    return tf >= jnp.maximum(tn, 0.0)


# subsample for memory: every 4th lane block keeps row structure
h_all = np.asarray(jax.jit(flags)(o2, d2))
act_np = np.asarray(active)
h_live = h_all[act_np]
print(f"  per-ray floor (live lanes): {h_live.sum(axis=1).mean():.2f} "
      f"of C={cb.shape[0]}", flush=True)


def row_stats(name, order):
    h = h_all[order]
    a = act_np[order]
    h = h & a[:, None]  # dead lanes flag nothing
    nn = h.shape[0] - h.shape[0] % 128
    row = h[:nn].reshape(-1, 128, h.shape[1]).any(axis=1)
    live_rows = a[:nn].reshape(-1, 128).any(axis=1)
    ru = row[live_rows].sum(axis=1)
    print(f"  {name:34s} row-union {ru.mean():6.2f}  (p90 {np.percentile(ru, 90):.0f})",
          flush=True)


key_np = np.asarray(key)
row_stats("shipped key (first,d2<=15,cnt<=15)", np.argsort(key_np, kind="stable"))

# widened signature: first(8) | second(8) | cnt(6)
h = h_all
anyh = h.any(axis=1)
first = np.where(anyh, h.argmax(axis=1), cb.shape[0] + 1)
ids = np.arange(cb.shape[0])[None, :]
rest = h & (ids != first[:, None])
second = np.where(rest.any(axis=1), rest.argmax(axis=1), cb.shape[0] + 1)
cnt = h.sum(axis=1)
wide = ((first.astype(np.int64) << 16)
        | (np.minimum(second, 255) << 8) | np.minimum(cnt, 255))
wide = np.where(act_np, wide, 1 << 60)
row_stats("widened key (first,second,cnt)", np.argsort(wide, kind="stable"))

# count-major widened
cm = (np.minimum(cnt, 255).astype(np.int64) << 24) | (first << 12) \
    | np.minimum(second - first, 4095)
cm = np.where(act_np, cm, 1 << 60)
row_stats("count-major (cnt,first,d2)", np.argsort(cm, kind="stable"))

# full-mask lexsort ideal (the unbeatable bound for 128-lane rows)
bits = np.packbits(h, axis=1)
order = np.lexsort(tuple(bits[:, i] for i in range(bits.shape[1] - 1, -1, -1)))
dead_last = np.concatenate([order[act_np[order]], order[~act_np[order]]])
row_stats("full-mask lexsort ideal", dead_last)

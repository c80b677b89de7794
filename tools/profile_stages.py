#!/usr/bin/env python
"""Per-stage TPU timing breakdown of one path-trace bounce.

Dispatch through the axon tunnel costs ~15-25 ms RTT, so single-shot stage
timings are meaningless below that floor.  Instead each stage is repeated K
times INSIDE one jit with a carried data dependency (so XLA cannot CSE the
repeats), and the marginal cost is the slope between K=1 and K=KHI.

Run: python -u tools/profile_stages.py [scene.txt]
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

from radish_pt_tpu.bsdf import materials as bsdf
from radish_pt_tpu.render import pathtrace as pt
from radish_pt_tpu.sampling import rng
from radish_pt_tpu.scene import build as sbuild
from radish_pt_tpu.scene import device_scene as dsc
from radish_pt_tpu.scene.parser import parse_scene

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


def slope(name, stage, seed_val, *static, key=None, only=None):
    """stage: (carry_f32[N], *static) -> f32[N]-reducible output.
    Times K in-jit repetitions; prints marginal ms per repetition.
    Skipped (returns 0) when ``only`` is given and ``key`` not in it."""
    if only is not None and key is not None and key not in only:
        return 0.0

    def rep(k):
        def f(x, *s):
            def body(i, c):
                out = stage(c, *s)
                return c + out * 1e-30  # dependency chain, keeps values sane
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f)

    t1 = _run(rep(1), seed_val, *static)
    thi = _run(rep(KHI), seed_val, *static)
    ms = (thi - t1) / (KHI - 1)
    print(f"  {name:38s} {ms:9.2f} ms   (k1={t1:.1f} k{KHI}={thi:.1f})")
    return ms


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/cornell_box.txt"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    desc = parse_scene(scene_path)
    ds, cam = sbuild.build_device_scene(desc)
    n = cam.width * cam.height
    print(f"scene={scene_path} tris={ds.num_triangles} lanes={n} "
          f"intersector={ds.intersector}")

    idx = jnp.arange(n, dtype=jnp.int32)
    sampler0 = rng.make_sampler(7, idx)
    key = jax.random.PRNGKey(0)

    ray_o, ray_d, _ = jax.jit(pt._gen_primary)(ds, cam, sampler0, idx)
    it = jax.jit(lambda o, d: dsc.intersect(ds, o, d))(ray_o, ray_d)
    pos = jax.device_get(it.pos)
    pos = jnp.asarray(pos)
    sec_d = jax.random.normal(key, (n, 3))
    sec_d = sec_d / jnp.linalg.norm(sec_d, axis=-1, keepdims=True)
    r4 = jax.random.uniform(key, (n, 4))
    mat, norm = jax.jit(
        lambda i: dsc.get_textured_material(ds, i.mat_id, i.uv, i.norm))(it)

    # each stage maps a perturbable f32[N] carry -> f32[N]
    print(f"\n--- marginal stage costs (slope over {KHI} in-jit reps) ---")
    t = {}

    def st_rng(c):
        s = rng.SamplerState(scramble=(c * 1e30).astype(jnp.uint32) ^ sampler0.scramble,
                             ptr=sampler0.ptr)
        r, _ = rng.sample_4d(ds.sobol, s)
        return r[:, 0]

    t["rng4"] = slope("rng.sample_4d", st_rng, jnp.zeros(n), key="rng4", only=only)

    def st_isect(c):
        o = ray_o + c[:, None]
        return dsc.intersect(ds, o, ray_d).pos[:, 0]

    t["isect"] = slope("intersect+surface_info (coherent)", st_isect, jnp.zeros(n), key="isect", only=only)

    def st_isect_div(c):
        o = pos + sec_d * 1e-5 + c[:, None]
        return dsc.intersect(ds, o, sec_d).pos[:, 0]

    t["isect_div"] = slope("intersect+surface_info (divergent)", st_isect_div,
                           jnp.zeros(n), key="isect_div", only=only)

    if ds.intersector == "pallas_mxu":
        from radish_pt_tpu.accel.pallas_kernels import intersect_plucker_pallas

        def st_raw(c):
            o = pos + sec_d * 1e-5 + c[:, None]
            return intersect_plucker_pallas(
                ds.tri_packed, o, sec_d,
                tri_order=ds.tri_order, cluster_bounds=ds.cluster_bounds,
            )[1]

        t["raw"] = slope("raw MXU sweep (divergent, unsorted)", st_raw,
                         jnp.zeros(n), key="raw", only=only)

        def st_isrt(c):
            o = pos + sec_d * 1e-5 + c[:, None]
            return dsc.intersect_sorted(ds, o, sec_d).pos[:, 0]

        t["isect_sorted"] = slope("intersect_sorted (divergent)", st_isrt,
                                  jnp.zeros(n), key="isect_sorted", only=only)

        if ds.cluster_bounds is not None:
            def st_key(c):
                o = pos + c[:, None]
                return dsc._sort_key(ds, o, sec_d).astype(jnp.float32)

            t["sortkey"] = slope("signature sort key", st_key, jnp.zeros(n), key="sortkey", only=only)

        def st_osrt(c):
            o = pos + c[:, None]
            return dsc.test_occlusion_sorted(ds, o, o + sec_d * 2.0).astype(
                jnp.float32)

        t["occ_sorted"] = slope("test_occlusion_sorted", st_osrt, jnp.zeros(n), key="occ_sorted", only=only)

    def st_surf(c):
        prim = (it.prim_id + (c * 1e30).astype(jnp.int32)) % jnp.maximum(
            ds.num_triangles, 1)
        p, nn, uv, _ = dsc.surface_info(ds, prim, it.uv)
        return p[:, 0] + nn[:, 0] + uv[:, 0]

    t["surf"] = slope("surface_info gathers", st_surf, jnp.zeros(n), key="surf", only=only)

    def st_mat(c):
        mid = (it.mat_id + (c * 1e30).astype(jnp.int32)) % ds.mat_type.shape[0]
        sm, nn = dsc.get_textured_material(ds, mid, it.uv, it.norm)
        return sm.base_color[:, 0] + nn[:, 0]

    t["mat"] = slope("get_textured_material", st_mat, jnp.zeros(n), key="mat", only=only)

    def st_light(c):
        li, wi, dist, pdf = dsc.sample_direct_light_no_vis(ds, pos + c[:, None], r4)
        return li[:, 0] + wi[:, 0] + pdf

    t["light"] = slope("sample_direct_light_no_vis", st_light, jnp.zeros(n), key="light", only=only)

    def st_occ(c):
        return dsc.test_occlusion(ds, pos + c[:, None], pos + sec_d * 2.0).astype(
            jnp.float32)

    t["occ"] = slope("test_occlusion", st_occ, jnp.zeros(n), key="occ", only=only)

    def st_beval(c):
        w = m_norm(sec_d + c[:, None])
        return bsdf.bsdf_eval(mat, norm, -ray_d, w)[:, 0] + bsdf.bsdf_pdf(
            mat, norm, -ray_d, w)

    t["beval"] = slope("bsdf eval+pdf", st_beval, jnp.zeros(n), key="beval", only=only)

    def st_bsample(c):
        samp = bsdf.bsdf_sample(mat, norm, -ray_d, r4[:, :3] * (1 - c[:, None] * 1e-30))
        return samp.dir[:, 0] + samp.pdf

    t["bsample"] = slope("bsdf sample", st_bsample, jnp.zeros(n), key="bsample", only=only)

    if only is None or "frame" in only:
        print("\n--- whole-frame reference ---")
        full = _run(jax.jit(lambda lo: pt.path_trace(ds, cam, lo, 5)), 7)
        d1 = _run(jax.jit(lambda lo: pt.path_trace(ds, cam, lo, 1)), 7)
        print(f"  path_trace depth 5: {full:.1f} ms;  depth 1: {d1:.1f} ms;  "
              f"marginal bounce: {(full - d1) / 4:.1f} ms")
    if only is None:
        per_bounce_sum = (t["rng4"] * 2 + t["isect_div"] + t["surf"] + t["mat"]
                          + t["light"] + t["occ"] + t["beval"] + t["bsample"])
        print(f"  sum of isolated per-bounce stages: {per_bounce_sum:.1f} ms")


def m_norm(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


if __name__ == "__main__":
    main()

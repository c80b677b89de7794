#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json): "Mrays/s + ms/frame at 800x800 1spp (Cornell,
teapot); ReSTIR frame time".  The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured against an interactive-rendering
target of 33.3 ms/frame (30 fps) at 800x800 — the bar the reference's
ImGui-driven interactive loop implicitly sets.

INCREMENTAL EMISSION: the running JSON line is re-printed after every
completed measurement, so a driver timeout mid-run still leaves the last
printed line parseable with every finished number (round-4 lesson:
`BENCH_r04.json` rc=124 lost glass/hires/many_light because the old
harness printed once at the very end).  Scenes run least-driver-verified
first (glass, teapot_hires, many_light) so their claims land even in a
short window.

Run: python bench.py [--quick] [--json-only] [--scenes ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_TARGET_MS = 33.33  # 30 fps interactive target

# TPU-side image-regression guard (the 800^2 analogue of the tiny CPU
# goldens): mean radiance of frame looper=7 per scene, pinned from the
# round-4 cluster_sweep runs at the pinned per-scene cluster sizes.
# Engine/tuning changes that corrupt results show up here as drift even
# when they keep prim-id parity on the small CPU fixtures (a fixed-width
# winner key once silently broke only above 64-tri clusters).
MEAN_GOLDEN = {
    "cornell": 1.00752,
    "teapot": 0.43335,
    "glass": 0.35154,
    "teapot_hires": 0.43550,
    "many_light": 0.17366,
}

# least-driver-verified scenes first: a timeout then still captures the
# claims that most need confirmation (VERDICT r4 #1)
SCENE_ORDER = ("glass", "teapot_hires", "many_light", "teapot", "cornell")


def _sync(out):
    """Force device completion by fetching data — on the tunneled TPU
    backend, block_until_ready returns before execution finishes; only a
    host transfer truly synchronizes.  Fetch ONE element, not the whole
    leaf: pulling a full 800x800x3 image through the tunnel costs ~45 ms
    and would inflate every frame time."""
    import numpy as np

    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def _time_frames(step_fn, n_warmup: int = 2, n_iter: int = 8, reps: int = 3):
    """Median of ``reps`` timed blocks (each ``n_iter`` frames, one fetch
    sync at the end).  One warmup pass, then independent repetitions so
    tunnel drift between blocks is visible as spread, not silently folded
    into the mean.  Returns (median_ms, min_ms, max_ms)."""
    for i in range(n_warmup):
        _sync(step_fn(i))
    samples = []
    k = n_warmup
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = step_fn(k)
            k += 1
        _sync(out)
        samples.append((time.perf_counter() - t0) / n_iter * 1e3)
    samples.sort()
    return samples[len(samples) // 2], samples[0], samples[-1]


def _retry(fn, log, what: str, attempts: int = 2):
    """Run ``fn``; on failure retry once (tunnel transport errors are
    transient — a single aborted probe must not hole the bench).  ``fn``
    must be self-contained: any donated buffers are rebuilt inside it so a
    retry never re-dispatches already-deleted arrays (ADVICE r4)."""
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a + 1 == attempts:
                raise
            log(f"[{what}] attempt {a + 1} failed "
                f"({type(e).__name__}: {e}); retrying")
    raise AssertionError("unreachable")


def bench(quick: bool = False, verbose: bool = True, only: list | None = None,
          emit=None):
    import jax

    from radish_pt_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from radish_pt_tpu.config import ReservoirReuse
    from radish_pt_tpu.render import gbuffer as gb
    from radish_pt_tpu.render import pathtrace as pt
    from radish_pt_tpu.render import restir as rs
    from radish_pt_tpu.scene.build import load_scene

    res = 256 if quick else 800
    depth = 5
    results = {}

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr)

    def checkpoint():
        """Re-print the running JSON line (see module docstring)."""
        if emit is not None:
            emit(results, res)

    scenes = []
    for nm in SCENE_ORDER:
        fname = "cornell_box.txt" if nm == "cornell" else f"{nm}.txt"
        path = os.path.join(REPO, "scenes", fname)
        if os.path.exists(path):
            scenes.append((nm, path))
    if quick:
        scenes = [(n, p) for n, p in scenes if n in ("cornell", "teapot")]
    if only:
        scenes = [(n, p) for n, p in scenes if n in only]

    for name, path in scenes:
        t_scene = time.perf_counter()
        # one failing config must not zero the whole bench (the driver
        # records this output verbatim)
        try:
            ds, cam, desc = load_scene(path)
            cam = cam.replace(width=res, height=res)
            n_rays_primary = res * res

            # CLOSURE-form jit (scene/camera as baked constants, looper as
            # the only argument): measured 382 s vs >585 s TPU compile for
            # the argument-form teapot frame — and it shares the persistent
            # cache key with the warmup tools, so a driver run after a
            # warmed build starts from cache hits.
            fn = jax.jit(lambda looper: pt.path_trace(ds, cam, looper, depth))
            big = name == "teapot_hires"
            ms, ms_lo, ms_hi = _retry(
                lambda: _time_frames(
                    lambda i: fn(i),
                    n_warmup=1 if big else 2,
                    n_iter=2 if big else 8,
                    reps=2 if big else 3,
                ),
                log, name,
            )
        except Exception as e:  # noqa: BLE001
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            results[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            checkpoint()
            continue
        # rays per frame: primary + per-bounce (extension + shadow) upper bound
        # count the *primary* figure like the reference's per-frame quote
        mrays = n_rays_primary * (1 + 2 * depth) / (ms * 1e-3) / 1e6
        results[f"{name}_pt_ms"] = round(ms, 3)
        results[f"{name}_pt_ms_spread"] = [round(ms_lo, 3), round(ms_hi, 3)]
        results[f"{name}_pt_mrays"] = round(mrays, 2)
        log(f"[{name}] full PT {res}x{res} depth={depth}: {ms:.2f} ms/frame "
            f"(min {ms_lo:.2f} / max {ms_hi:.2f}), {mrays:.1f} Mrays/s")
        checkpoint()

        if not quick and res == 800:
            try:
                import numpy as np

                d7, i7 = fn(7)
                mean = float((np.asarray(d7) + np.asarray(i7)).mean())
                results[f"{name}_mean"] = round(mean, 5)
                gold = MEAN_GOLDEN.get(name)
                if gold is not None and abs(mean - gold) > 2e-3 * gold:
                    results[f"{name}_mean_drift_from"] = gold
                    log(f"[{name}] WARNING: mean radiance {mean:.5f} "
                        f"drifted from golden {gold:.5f}")
            except Exception as e:  # noqa: BLE001
                log(f"[{name} mean] skipped: {type(e).__name__}: {e}")
            checkpoint()

        # utilization accounting (the MFU analogue): swept-pair throughput
        # vs the measured VPU/MXU ceilings + cull efficiency vs the per-ray
        # floor (utils/pairstats.py; model constants documented there)
        try:
            from radish_pt_tpu.utils import pairstats as ps

            st = _retry(lambda: ps.frame_pair_stats(ds, cam, 1, depth),
                        log, f"{name} util")
            if st is not None:
                util = ps.utilization(st, ms)
                results[f"{name}_gpairs_per_s"] = util["gpairs_per_s"]
                results[f"{name}_vpu_util_pct"] = util["vpu_util_pct"]
                results[f"{name}_mxu_util_pct"] = util["mxu_util_pct"]
                results[f"{name}_cull_eff_pct"] = util["cull_efficiency_pct"]
                log(f"[{name}] util: {util['gpairs_per_s']} Gpairs/s "
                    f"({util['vpu_util_pct']}% VPU, {util['mxu_util_pct']}% "
                    f"MXU model), cull eff {util['cull_efficiency_pct']}% "
                    f"of per-ray floor")
        except Exception as e:  # noqa: BLE001
            log(f"[{name} util] skipped: {type(e).__name__}: {e}")
        checkpoint()

        # batched steady state: block spp per dispatch (fori_loop in one
        # jit) — the per-frame cost without the ~20 ms tunnel dispatch RTT,
        # i.e. the honest analogue of the reference's on-GPU kernel timing
        try:
            from radish_pt_tpu.render.renderer import _pt_batch

            block = 2 if name == "teapot_hires" else 4
            # closure-form for compile time / cache sharing (see above);
            # the mutable accumulation buffers stay arguments for donation
            bfn = jax.jit(
                lambda looper, d, ind, it: _pt_batch(
                    ds, cam, looper, d, ind, it,
                    max_depth=depth, block=block,
                ),
                donate_argnums=(1, 2),
            )
            n = res * res

            def run_batched():
                # fresh buffers per attempt: donation consumes them, so a
                # retry after a mid-dispatch failure must not reuse
                # already-deleted arrays (ADVICE r4)
                pstate = {
                    "direct": jnp.zeros((n, 3), jnp.float32),
                    "indirect": jnp.zeros((n, 3), jnp.float32),
                }

                def pt_batched_step(i):
                    d, ind = bfn(i * block, pstate["direct"],
                                 pstate["indirect"], i * block)
                    pstate.update(direct=d, indirect=ind)
                    return d

                return _time_frames(
                    pt_batched_step, n_warmup=1,
                    n_iter=2 if (quick or name == "teapot_hires") else 4,
                )

            ms_pb, pb_lo, pb_hi = _retry(run_batched, log, f"{name} batched")
            ms_pb, pb_lo, pb_hi = ms_pb / block, pb_lo / block, pb_hi / block
            results[f"{name}_pt_batched_ms"] = round(ms_pb, 3)
            results[f"{name}_pt_batched_ms_spread"] = [
                round(pb_lo, 3), round(pb_hi, 3)
            ]
            log(f"[{name}] full PT steady-state (batched x{block}): "
                f"{ms_pb:.2f} ms/spp (min {pb_lo:.2f} / max {pb_hi:.2f})")
        except Exception as e:  # noqa: BLE001
            log(f"[{name} batched] FAILED: {type(e).__name__}: {e}")
            results[f"{name}_batched_error"] = f"{type(e).__name__}: {e}"[:200]
        checkpoint()

        # ReSTIR frame (gbuffer + restir kernel), cornell only
        if name == "cornell":
          try:
            gfn = jax.jit(gb.render_gbuffer)
            gbuf = gfn(ds, cam, cam)
            jax.block_until_ready(gbuf)
            n = res * res
            reservoir = rs.empty_reservoir(n)

            rfn = jax.jit(
                lambda ds, cam, looper, gbuf, lastf, lastr, first: rs.restir_direct(
                    ds, cam, looper, gbuf, lastf, lastr, first,
                    ReservoirReuse.TEMPORAL_SPATIAL, 32, 20,
                )
            )

            state = {"res": reservoir, "first": True}

            def restir_step(i):
                gbuf_i = gfn(ds, cam, cam)
                d, r = rfn(
                    ds, cam, i, gbuf_i, gbuf_i.frame, state["res"],
                    jnp.asarray(state["first"]),
                )
                state["res"] = r
                state["first"] = False
                return d

            ms_r, _, _ = _retry(
                lambda: _time_frames(
                    restir_step, n_warmup=2, n_iter=4 if quick else 8
                ),
                log, "restir",
            )
            results["restir_frame_ms"] = round(ms_r, 3)
            log(f"[cornell] ReSTIR frame (gbuffer + 32-candidate RIS + T+S reuse): {ms_r:.2f} ms")
            checkpoint()

            # steady-state batched ReSTIR: 8 frames per dispatch with carried
            # reservoir state (render/renderer.py::_restir_batch) — the
            # interactive mode's effective per-frame cost without tunnel RTT
            from functools import partial

            from radish_pt_tpu.render.renderer import _restir_batch

            block = 8
            bfn = jax.jit(
                partial(
                    _restir_batch,
                    reuse=ReservoirReuse.TEMPORAL_SPATIAL,
                    reservoir_size=32, clamp=20, encode_normal=False,
                    block=block,
                ),
                donate_argnums=(7,),
            )

            def run_restir_batched():
                # fresh donated buffer per attempt (see run_batched)
                bstate = {
                    "res": rs.empty_reservoir(n),
                    "direct": jnp.zeros((n, 3), jnp.float32),
                    "last": gbuf.frame,
                    "first": True,
                }

                def restir_batched_step(i):
                    d, r, g = bfn(
                        ds, cam, cam, i * block, bstate["last"],
                        bstate["res"], jnp.asarray(bstate["first"]),
                        bstate["direct"], i * block,
                    )
                    bstate.update(res=r, direct=d, last=g.frame, first=False)
                    return d

                return _time_frames(
                    restir_batched_step, n_warmup=2, n_iter=2 if quick else 4
                )

            ms_b, _, _ = _retry(run_restir_batched, log, "restir batched")
            ms_b = ms_b / block
            results["restir_batched_ms"] = round(ms_b, 3)
            log(f"[cornell] ReSTIR steady-state (batched x{block}): {ms_b:.2f} ms/frame")
          except Exception as e:  # noqa: BLE001
            log(f"[cornell restir] FAILED: {type(e).__name__}: {e}")
            results["restir_error"] = f"{type(e).__name__}: {e}"[:200]
          checkpoint()
        log(f"[{name}] scene total {time.perf_counter() - t_scene:.0f} s")

    return results, res


def _pack(results, res, backend=None):
    """Assemble the driver JSON from the running results dict."""
    primary = 0.0
    for k in ("teapot_pt_ms", "glass_pt_ms", "cornell_pt_ms",
              "teapot_hires_pt_ms", "many_light_pt_ms"):
        if results.get(k):
            primary = results[k]
            break
    return {
        "metric": "ms/frame full-MIS PT 800x800 1spp depth5 (teapot if present else glass/cornell)",
        "value": primary,
        "unit": "ms",
        "vs_baseline": round(BASELINE_TARGET_MS / primary, 3) if primary else 0.0,
        "detail": dict(results),
        "resolution": res,
        "backend": backend,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="256x256, fewer iters")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="bench only these scene names (timeout-window runs)")
    args = ap.parse_args()

    import jax

    backend = jax.devices()[0].platform

    def emit(results, res):
        print(json.dumps(_pack(results, res, backend)), flush=True)

    results, res = bench(quick=args.quick, verbose=not args.json_only,
                         only=args.scenes, emit=emit)
    print(json.dumps(_pack(results, res, backend)), flush=True)


if __name__ == "__main__":
    main()

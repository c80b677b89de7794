#!/usr/bin/env python
"""Microbench for the pair-binning engine: lax.sort at pair-list scales.

The engine sorts (unit_key, ray features...) pair rows so each 128-lane
kernel row shares one cull unit.  Cost model inputs:
  - fwd sort: key + ~11 payload cols at N*B lanes (3.8M / 7.7M)
  - inv sort: key + 2 payload cols (prim, dist) back to [N, B] slots
All results are consumed (summed) so XLA cannot DCE payload columns.

Run: timeout 2400 python -u tools/pairbench.py
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


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1).view(np.uint8)[0])


def slope(name, fn, x0, *args, khi=4, n_iter=3):
    def rep(k):
        def f(x, *s):
            def body(i, c):
                out = fn(c, *s)
                return c + out * 1e-30
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f)

    def run(f):
        for _ in range(2):
            sync(f(x0, *args))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f(x0, *args)
        sync(out)
        return (time.perf_counter() - t0) / n_iter * 1e3

    try:
        t1 = run(rep(1))
        thi = run(rep(khi))
        print(f"  {name:58s} {(thi - t1) / (khi - 1):9.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {name:58s} FAILED: {str(e)[:140]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    for M in (1_920_000, 3_840_000, 7_680_000):
        x0 = jnp.zeros(M)
        k31 = jax.random.randint(key, (M,), 0, 1 << 30)
        cols = jax.random.normal(key, (11, M))

        def fwd(c, k31, cols, p=11):
            kk = k31 + (c[:1] * 1e-30).astype(jnp.int32).sum()
            ops = (kk,) + tuple(cols[i] for i in range(p))
            s = jax.lax.sort(ops, num_keys=1)
            out = s[1]
            for i in range(2, p + 1):
                out = out + s[i]
            return out

        slope(f"fwd sort key+11 cols @ {M//1000}k", fwd, x0, k31, cols)

        def inv(c, k31, cols):
            kk = k31 + (c[:1] * 1e-30).astype(jnp.int32).sum()
            s = jax.lax.sort((kk, cols[0], cols[1]), num_keys=1)
            return s[1] + s[2]

        slope(f"inv sort key+2 cols  @ {M//1000}k", inv, x0, k31, cols)

        def key_only(c, k31):
            kk = k31 + (c[:1] * 1e-30).astype(jnp.int32).sum()
            s = jax.lax.sort((kk, kk * 2), num_keys=1)
            return s[1].astype(jnp.float32)

        slope(f"sort key+1 col       @ {M//1000}k", key_only, x0, k31)


if __name__ == "__main__":
    main()

"""Microbench _clip_cols variants: where do 12.7 ms go at E=262k?

Hypothesis: XLA re-fuses the rec.T / mm.T transposes into every consumer
column, re-scanning the 128-lane-padded table per column. Variants:
  A current (transpose, unpinned)
  B transpose pinned with optimization_barrier (materialize once)
  C column slices, no transpose
  D gather + barrier THEN transpose+cols (pin the gather output)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import TRI_CAPACITY
from renderer_tpu.scene.types import TR_POS


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<52s} {ms:8.2f} ms", flush=True)
    return out


def cols_from(rt, mt):
    cols = []
    for c in range(3):
        x = rt[TR_POS + 3 * c]
        y = rt[TR_POS + 3 * c + 1]
        z = rt[TR_POS + 3 * c + 2]
        for i in range(4):
            cols.append(
                mt[4 * i] * x + mt[4 * i + 1] * y + mt[4 * i + 2] * z + mt[4 * i + 3]
            )
    return cols


def main():
    E = 2 * TRI_CAPACITY
    NT = 1 << 18
    N = 16384
    k0 = jax.random.PRNGKey(0)
    lib_rec = jax.random.normal(k0, (NT, 36), jnp.float32)
    lib_mm = jax.random.normal(jax.random.PRNGKey(1), (N, 16), jnp.float32)
    tri_idx = jax.random.randint(jax.random.PRNGKey(2), (E,), 0, NT, jnp.int32)
    owner = jax.random.randint(jax.random.PRNGKey(3), (E,), 0, N, jnp.int32)

    def vA(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        return sum(jnp.sum(c) for c in cols_from(rec.T, mm.T))

    def vB(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        rt = jax.lax.optimization_barrier(rec.T)
        mt = jax.lax.optimization_barrier(mm.T)
        return sum(jnp.sum(c) for c in cols_from(rt, mt))

    def vC(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        rt = lambda i: rec[:, i]
        mt = lambda i: mm[:, i]
        cols = []
        for c in range(3):
            x, y, z = rt(TR_POS + 3 * c), rt(TR_POS + 3 * c + 1), rt(TR_POS + 3 * c + 2)
            for i in range(4):
                cols.append(mt(4 * i) * x + mt(4 * i + 1) * y + mt(4 * i + 2) * z + mt(4 * i + 3))
        return sum(jnp.sum(c) for c in cols)

    def vD(tri_idx, owner):
        rec = jax.lax.optimization_barrier(lib_rec[tri_idx])
        mm = jax.lax.optimization_barrier(lib_mm[owner])
        return sum(jnp.sum(c) for c in cols_from(rec.T, mm.T))

    def gathers_only(tri_idx, owner):
        return jnp.sum(lib_rec[tri_idx]) + jnp.sum(lib_mm[owner])

    timeit("gathers only (rec 36w + mm 16w @262k)", gathers_only, tri_idx, owner)
    timeit("A transpose unpinned (current)", vA, tri_idx, owner)
    timeit("B transpose pinned", vB, tri_idx, owner)
    timeit("C column slices", vC, tri_idx, owner)
    timeit("D gather pinned, then transpose", vD, tri_idx, owner)

    # E: library stored pre-transposed, gather columns per corner from (36, NT)
    lib_rec_t = lib_rec.T
    lib_mm_t = lib_mm.T

    def vE(tri_idx, owner):
        rt = [lib_rec_t[i][tri_idx] for i in range(9)]  # 9 narrow gathers
        mt = [lib_mm_t[i][owner] for i in range(16)]
        cols = []
        for c in range(3):
            x, y, z = rt[3 * c], rt[3 * c + 1], rt[3 * c + 2]
            for i in range(4):
                cols.append(mt[4 * i] * x + mt[4 * i + 1] * y + mt[4 * i + 2] * z + mt[4 * i + 3])
        return sum(jnp.sum(c) for c in cols)

    timeit("E per-column narrow gathers (9+16)", vE, tri_idx, owner)


if __name__ == "__main__":
    main()

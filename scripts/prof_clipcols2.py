"""Isolate the 12 ms: transpose cost vs math cost vs gather-width effects."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import TRI_CAPACITY


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


def main():
    E = 2 * TRI_CAPACITY
    NT = 1 << 18
    N = 16384
    k0 = jax.random.PRNGKey(0)
    lib_rec = jax.random.normal(k0, (NT, 36), jnp.float32)
    lib_pos = jax.random.normal(k0, (NT, 12), jnp.float32)
    lib_mm = jax.random.normal(jax.random.PRNGKey(1), (N, 16), jnp.float32)
    tri_idx = jax.random.randint(jax.random.PRNGKey(2), (E,), 0, NT, jnp.int32)
    owner = jax.random.randint(jax.random.PRNGKey(3), (E,), 0, N, jnp.int32)
    rec_pre = jax.random.normal(k0, (E, 36), jnp.float32)
    mm_pre = jax.random.normal(k0, (E, 16), jnp.float32)
    rt_pre = jnp.asarray(rec_pre.T)
    mt_pre = jnp.asarray(mm_pre.T)

    def cols_from(rt, mt):
        cols = []
        for c in range(3):
            x, y, z = rt[3 * c], rt[3 * c + 1], rt[3 * c + 2]
            for i in range(4):
                cols.append(mt[4 * i] * x + mt[4 * i + 1] * y
                            + mt[4 * i + 2] * z + mt[4 * i + 3])
        return cols

    # T1: gather + transpose only (materialize (36,E))
    def t1(tri_idx, owner):
        return jnp.sum(lib_rec[tri_idx].T, axis=1) + 0 * jnp.sum(lib_mm[owner])

    timeit("T1 gather + rec.T materialized", t1, tri_idx, owner)

    # T2: math only from pre-transposed inputs
    def t2(rt, mt):
        return sum(jnp.sum(c) for c in cols_from(rt, mt))

    timeit("T2 math only, pre-transposed (36,E)/(16,E)", t2, rt_pre, mt_pre)

    # T3: transpose only of pre-gathered (E,36) + (E,16)
    def t3(rec, mm):
        return jnp.sum(rec.T, axis=1)[0] + jnp.sum(mm.T, axis=1)[0]

    timeit("T3 transpose only of (E,36)+(E,16)", t3, rec_pre, mm_pre)

    # T4: math from pre-gathered row-major via .T (fused transpose+math)
    def t4(rec, mm):
        return sum(jnp.sum(c) for c in cols_from(rec.T, mm.T))

    timeit("T4 math from (E,36).T (no gather)", t4, rec_pre, mm_pre)

    # T5: batched dot_general (E,3,4)x(E,4,4)
    def t5(rec, mm):
        posh = jnp.concatenate(
            [rec[:, :9].reshape(E, 3, 3), jnp.ones((E, 3, 1), jnp.float32)], -1)
        m = mm.reshape(E, 4, 4)
        out = jax.lax.dot_general(
            posh, m, (((2,), (2,)), ((0,), (0,))), precision="highest")
        return jnp.sum(out)

    timeit("T5 batched dot_general (E,3,4)@(E,4,4)", t5, rec_pre, mm_pre)

    # T6: narrow posh gather (E,12) + transpose + math
    def t6(tri_idx, owner):
        rec = lib_pos[tri_idx]
        mm = lib_mm[owner]
        return sum(jnp.sum(c) for c in cols_from(rec.T, mm.T))

    timeit("T6 12-wide pos gather + .T + math", t6, tri_idx, owner)

    # T7: half E (131k) full pipeline for scaling
    half = E // 2

    def t7(tri_idx, owner):
        rec = lib_rec[tri_idx[:half]]
        mm = lib_mm[owner[:half]]
        return sum(jnp.sum(c) for c in cols_from(rec.T, mm.T))

    timeit("T7 gather+T+math at E/2", t7, tri_idx, owner)

    # T8: math only but writing 12 materialized columns (the real consumer)
    def t8(rt, mt):
        cols = cols_from(rt, mt)
        return jax.lax.optimization_barrier(tuple(cols))

    timeit("T8 math, outputs materialized (12 x (E,))", t8, rt_pre, mt_pre)

    # T9: mm expanded at INSTANCE granularity then gathered as 16 wide +
    #     rec cols read with one fused pass returning mask-like single output
    def t9(rt, mt):
        cols = cols_from(rt, mt)
        x = [cols[0], cols[4], cols[8]]
        w = [cols[3], cols[7], cols[11]]
        out = (x[0] < -w[0]) & (x[1] < -w[1]) & (x[2] < -w[2])
        return jnp.sum(out)

    timeit("T9 math -> single bool output", t9, rt_pre, mt_pre)


if __name__ == "__main__":
    main()

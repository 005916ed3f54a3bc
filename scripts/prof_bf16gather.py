"""Is the 2M-row shade gather index-bound or width/dtype-bound? Decides
whether a bf16 record tier can shrink the shade path's 1 GB gather+dot."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, iters=30):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:<44s} {(time.perf_counter()-t0)/iters*1e3:7.2f} ms", flush=True)


def main():
    P, T = 1920 * 1088, 131072
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, (P,), np.int32))
    tab32 = jnp.asarray(rng.standard_normal((T, 128), np.float32))
    tab16 = tab32.astype(jnp.bfloat16)
    sel32 = jnp.eye(45, 128, dtype=jnp.float32)
    sel16 = sel32.astype(jnp.bfloat16)

    timeit("gather (P,128) f32", jax.jit(lambda t, i: t[i].sum()), tab32, idx)
    timeit("gather (P,128) bf16", jax.jit(lambda t, i: t[i].sum()), tab16, idx)

    @jax.jit
    def gd32(t, i):
        rows = t[i]
        c = jax.lax.dot_general(sel32, rows, (((1,), (1,)), ((), ())),
                                precision="highest")
        return c.sum()

    @jax.jit
    def gd16(t, i):
        rows = t[i]
        c = jax.lax.dot_general(sel16, rows, (((1,), (1,)), ((), ())))
        return c.sum()

    timeit("gather + selector dot f32(highest)", gd32, tab32, idx)
    timeit("gather + selector dot bf16", gd16, tab16, idx)


if __name__ == "__main__":
    main()

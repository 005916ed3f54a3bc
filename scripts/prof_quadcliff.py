"""Why did the texture quad gather go 3.75 -> 22.8 ms when the atlas grew
from 2 to 4 layers? Microbench: 2M-index row gathers from (rows, 64) u32
tables (the pack=4 quad table) as a function of table rows, both through
the [:, :16] bilinear slice (the real code path, texture.py:105) and from
a pre-compacted (rows, 16) table."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from renderer_tpu.utils.compile_cache import enable_persistent_cache
from scripts.timing import timeit_chained

P = 2088960


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    for rows in (11_000, 22_000, 44_000, 88_000, 176_000):
        table = jnp.asarray(
            rng.integers(0, 2**32, size=(rows, 64), dtype=np.uint32)
        )
        idx = jnp.asarray(rng.integers(0, rows, size=(P,), dtype=np.int32))

        @jax.jit
        def g_slice(s, table=table, idx=idx):
            r = table[:, :16][idx]
            return r.astype(jnp.float32).sum(axis=1) + s

        @jax.jit
        def g_compact(s, table=jnp.asarray(np.ascontiguousarray(table[:, :16])), idx=idx):
            r = table[idx]
            return r.astype(jnp.float32).sum(axis=1) + s

        a = timeit_chained(g_slice, n=10)
        b = timeit_chained(g_compact, n=10)
        print(f"rows {rows:7d}: slice-path {a:6.2f} ms   compact {b:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

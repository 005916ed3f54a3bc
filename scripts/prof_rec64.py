"""A/B: shade-record width 128 vs 64 for the 2M-index row gather + selector
dot (the two biggest shade ops after the texture gather).

The (T,49) narrow-row experiment was REJECTED (+6 ms: unaligned rows leave
the gather's contiguous-row fast path). 64-lane rows ARE aligned (two records
per physical 128-lane row), so this measures whether the fast path survives
and how much the K=64 dot saves.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.timing import timeit_chained

T = 1 << 17
P = 1920 * 1088
N_SEL = 45

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (P,), 0, T, dtype=jnp.int32)
tab128 = jax.random.normal(key, (T, 128), jnp.float32)
tab64 = tab128[:, :64].copy()

sel128 = np.zeros((N_SEL, 128), np.float32)
sel128[np.arange(N_SEL), np.arange(N_SEL)] = 1.0
sel64 = np.ascontiguousarray(sel128[:, :64])


def make(tab, sel):
    sel = jnp.asarray(sel)

    @jax.jit
    def f(s, tab, idx):
        rows = tab[idx] + s
        cols = jax.lax.dot_general(
            sel, rows, (((1,), (1,)), ((), ())), precision="highest"
        )
        return jnp.sum(cols[0][:8])

    return lambda s: f(s, tab, idx)


@jax.jit
def gather_only(s, tab, idx):
    rows = tab[idx] + s
    return jnp.sum(rows[0])


for name, tab, sel in (("128", tab128, sel128), ("64", tab64, sel64)):
    ms_g = timeit_chained(lambda s, t=tab: gather_only(s, t, idx), n=20)
    ms = timeit_chained(make(tab, sel), n=20)
    print(f"width {name}: gather-only {ms_g:7.2f} ms   gather+dot {ms:7.2f} ms")

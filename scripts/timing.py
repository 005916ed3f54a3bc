"""Chained device timing for the axon TPU tunnel.

block_until_ready is NOT a reliable sync through the tunnel (2026-08-18: a
1 GB gather "measured" 0.08 ms; an 8k^3 matmul "ran" at 45,909 TFLOP/s).
Dispatches pipeline in a deep queue and block_until_ready returns before
execution completes; only a HOST FETCH forces real synchronization.

Correct recipe (what bench.py effectively does with its donated state
chain): make every iteration DATA-DEPEND on the previous one so the device
serializes them, run enough iterations to dwarf the fetch RTT, and fetch a
scalar at the end. Calibration: the chained 8k^3 f32 matmul lands at
~53 TFLOP/s and the (131k,128)-row 2M-index gather at 6.4 ms — both match
first-principles v5e numbers and PERF.md's measured gather law.
"""
import time

import jax.numpy as jnp


def timeit_chained(f, *args, n=30):
    """Median-free steady-state ms/call of f(s, *args) -> array.

    f must fold the scalar s into its computation (e.g. `x + s`) so the
    chain `s_{k+1} = f(s_k)[0] * 1e-30` creates a true data dependency.
    """
    s = jnp.float32(0.0)
    out = f(s, *args)
    float(out.ravel()[0])  # compile + drain
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(s, *args)
        s = out.ravel()[0] * 1e-30
    float(s)
    return (time.perf_counter() - t0) / n * 1000

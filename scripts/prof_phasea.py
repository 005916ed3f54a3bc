"""Phase-A variants, consumer-shaped: gather -> clip math -> (key, mask).

The real phase A of build_draw_stream: rec gather (E,36) + mm gather (E,16),
12 clip columns, frustum+backface mask, Morton key. Current formulation
(_clip_cols via .T) costs ~15.8 ms at E=262k; parts cost ~7. Variants:
  V0 current column math via .T
  V1 batched dot_general (E,3,4)@(E,4,4), cols sliced from (E,3,4)
  V2 dot_general, then reshape (E,12) -> transpose -> rows
  V3 gather -> Pallas transpose firewall -> column math
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import TRI_CAPACITY
from renderer_tpu.ops.cull import _morton2d

TR_POS = 0


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


def key_mask_from_cols(cols, valid):
    """Exactly the real consumer: frustum + backface + Morton key."""
    x = [cols[0], cols[4], cols[8]]
    y = [cols[1], cols[5], cols[9]]
    z = [cols[2], cols[6], cols[10]]
    w = [cols[3], cols[7], cols[11]]
    out = (x[0] < -w[0]) & (x[1] < -w[1]) & (x[2] < -w[2])
    out |= (x[0] > w[0]) & (x[1] > w[1]) & (x[2] > w[2])
    out |= (y[0] < -w[0]) & (y[1] < -w[1]) & (y[2] < -w[2])
    out |= (y[0] > w[0]) & (y[1] > w[1]) & (y[2] > w[2])
    out |= (z[0] < 0) & (z[1] < 0) & (z[2] < 0)
    out |= (z[0] > w[0]) & (z[1] > w[1]) & (z[2] > w[2])
    u0 = [x[c] + w[c] for c in range(3)]
    u1 = [w[c] - y[c] for c in range(3)]
    u2 = w
    det = (
        u0[0] * (u1[1] * u2[2] - u1[2] * u2[1])
        - u0[1] * (u1[0] * u2[2] - u1[2] * u2[0])
        + u0[2] * (u1[0] * u2[1] - u1[1] * u2[0])
    )
    mask = valid & ~out & (det > 0)
    safe = [jnp.where(jnp.abs(wc) > 1e-9, wc, 1e-9) for wc in w]
    all_front = (w[0] > 1e-9) & (w[1] > 1e-9) & (w[2] > 1e-9)
    px = [x[c] / safe[c] for c in range(3)]
    py = [y[c] / safe[c] for c in range(3)]
    cx = jnp.clip(
        (jnp.minimum(jnp.minimum(px[0], px[1]), px[2])
         + jnp.maximum(jnp.maximum(px[0], px[1]), px[2])) * 0.25 + 0.5, 0.0, 1.0)
    cy = jnp.clip(
        (jnp.minimum(jnp.minimum(py[0], py[1]), py[2])
         + jnp.maximum(jnp.maximum(py[0], py[1]), py[2])) * -0.25 + 0.5, 0.0, 1.0)
    gx = jnp.where(all_front, (cx * 1023).astype(jnp.uint32), 0)
    gy = jnp.where(all_front, (cy * 1023).astype(jnp.uint32), 0)
    key = jnp.where(mask, _morton2d(gx, gy), jnp.uint32(0xFFFFFFFF))
    return key, mask


def cols_via_T(rec, mm):
    rt = rec.T
    mt = mm.T
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


def _tr_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


def pallas_transpose(x):
    """(E, k) -> (k, E) as a hard layout firewall between the gather and the
    column math (XLA otherwise sinks the transposed layout into the gather,
    making its writes strided)."""
    e, k = x.shape
    blk = 512
    return pl.pallas_call(
        _tr_kernel,
        grid=(e // blk,),
        in_specs=[pl.BlockSpec((blk, k), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((k, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, e), x.dtype),
    )(x)


def main():
    E = 2 * TRI_CAPACITY
    NT = 1 << 18
    N = 16384
    k0 = jax.random.PRNGKey(0)
    lib_rec = jax.random.normal(k0, (NT, 36), jnp.float32)
    lib_mm = jax.random.normal(jax.random.PRNGKey(1), (N, 16), jnp.float32)
    tri_idx = jax.random.randint(jax.random.PRNGKey(2), (E,), 0, NT, jnp.int32)
    owner = jax.random.randint(jax.random.PRNGKey(3), (E,), 0, N, jnp.int32)
    valid = jnp.ones((E,), jnp.bool_)

    def v0(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        return key_mask_from_cols(cols_via_T(rec, mm), valid)

    def v1(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        posh = jnp.concatenate(
            [rec[:, TR_POS:TR_POS + 9].reshape(E, 3, 3),
             jnp.ones((E, 3, 1), jnp.float32)], -1)
        clip = jax.lax.dot_general(
            posh, mm.reshape(E, 4, 4),
            (((2,), (2,)), ((0,), (0,))), precision="highest")  # (E, 3, 4)
        cols = [clip[:, c, i] for c in range(3) for i in range(4)]
        return key_mask_from_cols(cols, valid)

    def v2(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        posh = jnp.concatenate(
            [rec[:, TR_POS:TR_POS + 9].reshape(E, 3, 3),
             jnp.ones((E, 3, 1), jnp.float32)], -1)
        clip = jax.lax.dot_general(
            posh, mm.reshape(E, 4, 4),
            (((2,), (2,)), ((0,), (0,))), precision="highest")
        ct = clip.reshape(E, 12).T  # (12, E)
        cols = [ct[4 * c + i] for c in range(3) for i in range(4)]
        return key_mask_from_cols(cols, valid)

    def v3(tri_idx, owner):
        rec = lib_rec[tri_idx]
        mm = lib_mm[owner]
        rt = pallas_transpose(rec)
        mt = pallas_transpose(mm)
        cols = []
        for c in range(3):
            x = rt[TR_POS + 3 * c]
            y = rt[TR_POS + 3 * c + 1]
            z = rt[TR_POS + 3 * c + 2]
            for i in range(4):
                cols.append(
                    mt[4 * i] * x + mt[4 * i + 1] * y
                    + mt[4 * i + 2] * z + mt[4 * i + 3])
        return key_mask_from_cols(cols, valid)

    stages = sys.argv[1] if len(sys.argv) > 1 else "0123"
    for name, fn in (("V0 current .T column math", v0),
                     ("V1 batched dot_general, (E,3,4) slices", v1),
                     ("V2 dot_general -> (E,12).T rows", v2),
                     ("V3 pallas-transpose firewall", v3)):
        if name[1] in stages:
            timeit(name, fn, tri_idx, owner)


if __name__ == "__main__":
    main()

"""Quad-table packing variants: memory vs sample cost at 2M px.

The (N, 16)-u32 quad table pads to 128 lanes physically = 512 B/texel.
Packing k texels per 128-lane row cuts memory k-fold (lossless); the
consumer then needs a k-way lane select after the row gather. Variants:
  P1 (N, 16) u32     — current, 512 B/texel
  P2 (N/2, 32) u32   — 2-way select, 256 B/texel
  P4 (N/4, 64) u32   — 4-way select, 128 B/texel
  P8 (N/8, 128) u32  — 8-way select,  64 B/texel
  U8 (N, 64) u8      — byte repack,  128 B/texel
Each consumer does the real bilinear unpack (4 u32 -> RGBA f32 -> weighted
sum) and reduces to keep outputs tiny.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<44s} {ms:8.2f} ms", flush=True)
    return out


def unpack4(word):
    return (
        (word & 0xFF).astype(jnp.float32),
        ((word >> 8) & 0xFF).astype(jnp.float32),
        ((word >> 16) & 0xFF).astype(jnp.float32),
        ((word >> 24) & 0xFF).astype(jnp.float32),
    )


def bilerp_from16(rows, fx, fy):
    acc = None
    wts = ((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy)
    for c, wt in enumerate(wts):
        r, g, bl, a = unpack4(rows[..., c])
        term = (r + g + bl + a) * wt
        acc = term if acc is None else acc + term
    return jnp.sum(acc)


def main():
    N = 1 << 20  # 1M texels
    P = 1920 * 1088
    key = jax.random.PRNGKey(0)
    tbl16 = jax.random.randint(key, (N, 16), 0, 1 << 30, jnp.uint32)
    tbl32 = tbl16.reshape(N // 2, 32)
    tbl64 = tbl16.reshape(N // 4, 64)
    tbl128 = tbl16.reshape(N // 8, 128)
    tbl_u8 = jax.device_put(
        np.frombuffer(np.asarray(tbl16).tobytes(), np.uint8).reshape(N, 64)
    )
    idx = jax.random.randint(jax.random.PRNGKey(1), (P,), 0, N, jnp.int32)
    fx = jax.random.uniform(jax.random.PRNGKey(2), (P,))
    fy = jax.random.uniform(jax.random.PRNGKey(3), (P,))

    def p1(idx, fx, fy):
        return bilerp_from16(tbl16[idx], fx, fy)

    def p2(idx, fx, fy):
        rows = tbl32[idx >> 1]  # (P, 32)
        odd = (idx & 1)[:, None] == 1
        sel = jnp.where(odd, rows[:, 16:32], rows[:, 0:16])
        return bilerp_from16(sel, fx, fy)

    def p4(idx, fx, fy):
        rows = tbl64[idx >> 2]  # (P, 64)
        sub = idx & 3
        s01 = jnp.where((sub & 1)[:, None] == 1, rows[:, 16:32], rows[:, 0:16])
        s23 = jnp.where((sub & 1)[:, None] == 1, rows[:, 48:64], rows[:, 32:48])
        sel = jnp.where((sub & 2)[:, None] == 2, s23, s01)
        return bilerp_from16(sel, fx, fy)

    def p8(idx, fx, fy):
        rows = tbl128[idx >> 3]  # (P, 128)
        sub = idx & 7
        quads = [rows[:, 16 * k : 16 * (k + 1)] for k in range(8)]
        lvl1 = [
            jnp.where((sub & 1)[:, None] == 1, quads[2 * k + 1], quads[2 * k])
            for k in range(4)
        ]
        lvl2 = [
            jnp.where((sub & 2)[:, None] == 2, lvl1[2 * k + 1], lvl1[2 * k])
            for k in range(2)
        ]
        sel = jnp.where((sub & 4)[:, None] == 4, lvl2[1], lvl2[0])
        return bilerp_from16(sel, fx, fy)

    def pu8(idx, fx, fy):
        rows = tbl_u8[idx].astype(jnp.uint32)  # (P, 64)
        words = (
            rows[:, 0::4]
            | (rows[:, 1::4] << 8)
            | (rows[:, 2::4] << 16)
            | (rows[:, 3::4] << 24)
        )  # (P, 16)
        return bilerp_from16(words, fx, fy)

    stages = sys.argv[1] if len(sys.argv) > 1 else "1248u"
    for tag, name, fn in (
        ("1", "P1 (N,16) u32 row gather [current]", p1),
        ("2", "P2 (N/2,32) 2-way select", p2),
        ("4", "P4 (N/4,64) 4-way select", p4),
        ("8", "P8 (N/8,128) 8-way select", p8),
        ("u", "U8 (N,64) u8 byte repack", pu8),
    ):
        if tag in stages:
            timeit(name, fn, idx, fx, fy)


if __name__ == "__main__":
    main()

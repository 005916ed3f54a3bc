"""Microbench: can the texture quad gather avoid the (P,16)->(P,128) padded
u32 output (whose channel-major relayout copy costs 1.68 ms/frame at 1080p)?

Candidates at 2M samples, all pulling the SAME 64 bytes/texel:
  A) current: u32 (N, 16) rows (pack=4 grouped prefix), slice [:, :16]
  B) u8 (N/2, 128) rows — 2 texels per physical row, dense gather output
  C) u16 (N, 32) rows padded... (same pad class as A, control)
Each variant is consumed channel-major (unpack + weighted sum) so the
relayout the frame actually pays is included.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

P = 2088960  # 1920x1088
NT = 1 << 22  # 4M texels in the table


from timing import timeit_chained


def consume16(words_f32, w):
    """channel-major consumption: weighted sum of the 16 unpacked channels."""
    acc = 0.0
    for k in range(4):
        acc = acc + words_f32[k] * w[k]
    return acc


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NT, size=(P,), dtype=np.int32))
    w = [jnp.asarray(rng.random((P,), dtype=np.float32)) for _ in range(4)]

    tbl_bytes = rng.integers(0, 256, size=(NT, 64), dtype=np.uint8)

    # A) u32 (NT/4, 64) rows: pack=4, slice the 16-word bilinear prefix
    tbl_u32 = jnp.asarray(
        tbl_bytes.reshape(NT // 4, 256).view(np.uint32)
    )  # (NT/4, 64) u32

    @jax.jit
    def variant_a(s, tbl_u32, idx, *w):
        w = tuple(x + s for x in w)
        rows = tbl_u32[:, :16][idx >> 2]  # (P, 16) u32, padded 8x
        sub = idx & 3
        chunks = [rows[:, 4 * k : 4 * k + 4] for k in range(4)]
        bit = 1
        while len(chunks) > 1:
            hi = (sub & bit)[:, None] != 0
            chunks = [
                jnp.where(hi, chunks[2 * k + 1], chunks[2 * k])
                for k in range(len(chunks) // 2)
            ]
            bit <<= 1
        words = chunks[0]  # (P, 4)
        vals = [
            (words[:, k] & 0xFF).astype(jnp.float32) * (1 / 255.0)
            for k in range(4)
        ]
        return consume16(vals, w)

    # B) u8 (NT/2, 128) rows: 2 texels per row, gather output dense
    tbl_u8 = jnp.asarray(tbl_bytes.reshape(NT // 2, 128))

    @jax.jit
    def variant_b(s, tbl_u8, idx, *w):
        w = tuple(x + s for x in w)
        rows = tbl_u8[idx >> 1]  # (P, 128) u8, DENSE
        sub = idx & 1
        lo = rows[:, :16]
        hi = rows[:, 64:80]
        bytes_ = jnp.where((sub == 1)[:, None], hi, lo)  # (P, 16) u8
        vals = [
            bytes_[:, 4 * k].astype(jnp.float32) * (1 / 255.0) for k in range(4)
        ]
        return consume16(vals, w)

    # B2) u8 rows but slice only the texel's 64-byte half via 2 chunks
    @jax.jit
    def variant_b2(s, tbl_u8, idx, *w):
        w = tuple(x + s for x in w)
        rows = tbl_u8[idx >> 1]  # (P, 128) u8 dense
        sub = (idx & 1).astype(jnp.uint8)
        # channel-major reads straight off the dense block
        vals = []
        for k in range(4):
            lo = rows[:, 4 * k]
            hi = rows[:, 64 + 4 * k]
            vals.append(
                jnp.where(sub == 1, hi, lo).astype(jnp.float32) * (1 / 255.0)
            )
        return consume16(vals, w)

    # C) f32 u16-halves (NT/4, 128) rows + transposing selector dot
    lo16 = (tbl_bytes.reshape(NT // 4, 256).view(np.uint16)).astype(np.float32)
    tbl_f32h = jnp.asarray(lo16)  # (NT/4, 128) f32 halves

    @jax.jit
    def variant_c(s, tbl_f32h, idx, *w):
        w = tuple(x + s for x in w)
        rows = tbl_f32h[idx >> 2]  # (P, 128) f32 dense (4 GB!)
        sel = np.zeros((32, 128), np.float32)
        sel[np.arange(32), np.arange(32)] = 1.0
        cols = jax.lax.dot_general(
            jnp.asarray(sel), rows, (((1,), (1,)), ((), ())),
            precision="highest",
        )  # (32, P)
        sub = idx & 3
        # texel t's halves are cols[8t : 8t+8]
        def pick(k):
            c = [cols[8 * t + k] for t in range(4)]
            x = jnp.where(sub == 1, c[1], c[0])
            x = jnp.where(sub == 2, c[2], x)
            return jnp.where(sub == 3, c[3], x)
        vals = [
            (pick(2 * k).astype(jnp.int32) & 0xFF).astype(jnp.float32)
            * (1 / 255.0)
            for k in range(4)
        ]
        return consume16(vals, w)

    for name, f, tbl in [("A u32-pad", variant_a, tbl_u32), ("B u8-dense", variant_b, tbl_u8),
                    ("B2 u8-chanmajor", variant_b2, tbl_u8), ("C f32h-dot", variant_c, tbl_f32h)]:
        try:
            ms = timeit_chained(f, tbl, idx, *w)
            print(f"{name:18s} {ms:7.2f} ms")
        except Exception as e:  # noqa
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

"""Prototype: one-gather trilinear texture sampling via a quad table.

Each texel row (128 u32) packs its level-l 2x2 bilinear quad plus the 3x3
level-(l+1) neighborhood that covers every possible l+1 bilinear footprint
for uv's that map to this l-texel. Validates exact equality with the 4/8-tap
reference path, then times both at 2M pixels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops.texture import sample_atlas_cf

QW = 16  # used columns: 4 quad + 9 next-level 3x3 + 3 pad


def build_quad_table_np(atlas, width=128):
    packed = np.asarray(atlas.packed_u32)
    offs = np.asarray(atlas.level_offset)
    sizes = np.asarray(atlas.level_size)
    n_layers = int(np.asarray(atlas.n_layers))
    n_levels = len(sizes)
    total = packed.shape[0]
    out = np.zeros((total, width), np.uint32)
    for l in range(n_levels):
        s = int(sizes[l])
        img = packed[offs[l] : offs[l] + n_layers * s * s].reshape(n_layers, s, s)
        x = np.arange(s)
        xp = (x + 1) & (s - 1)
        # l quad: t00, t10, t01, t11
        q00 = img
        q10 = img[:, :, xp]
        q01 = img[:, xp, :]
        q11 = img[:, xp][:, :, xp]
        rows = np.stack([q00, q10, q01, q11], axis=-1).reshape(-1, 4)
        out[offs[l] : offs[l] + n_layers * s * s, 0:4] = rows
        if l + 1 < n_levels:
            s1 = int(sizes[l + 1])
            img1 = packed[offs[l + 1] : offs[l + 1] + n_layers * s1 * s1].reshape(
                n_layers, s1, s1
            )
            # anchor a = floor(x/2) - 1 (mod s1); 3x3 from there
            ax = ((x >> 1) - 1) & (s1 - 1)
            cols = []
            for dy in range(3):
                for dx in range(3):
                    yy = (((x >> 1) - 1 + dy) & (s1 - 1))
                    xx = ((x >> 1) - 1 + dx) & (s1 - 1)
                    cols.append(img1[:, yy][:, :, xx])
            n3 = np.stack(cols, axis=-1).reshape(-1, 9)
            out[offs[l] : offs[l] + n_layers * s * s, 4:13] = n3
    return out


def _unpack(word):
    return jnp.stack(
        [
            (word & 0xFF).astype(jnp.float32),
            ((word >> 8) & 0xFF).astype(jnp.float32),
            ((word >> 16) & 0xFF).astype(jnp.float32),
            ((word >> 24) & 0xFF).astype(jnp.float32),
        ],
        axis=0,
    ) * (1.0 / 255.0)


def sample_quad(atlas, quad, layer, u, v, lod, trilinear=True):
    n_levels = atlas.num_levels
    safe_layer = jnp.maximum(layer, 0)
    uf = u - jnp.floor(u)
    vf = v - jnp.floor(v)
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    size = atlas.level_size[l0]
    fs = size.astype(jnp.float32)
    tx = uf * fs - 0.5
    ty = vf * fs - 0.5
    x0f = jnp.floor(tx)
    y0f = jnp.floor(ty)
    fx = tx - x0f
    fy = ty - y0f
    m = size - 1
    x0 = x0f.astype(jnp.int32) & m
    y0 = y0f.astype(jnp.int32) & m
    idx = atlas.level_offset[l0] + (safe_layer * size + y0) * size + x0
    rows = quad[idx]  # (..., 128) u32 — THE one gather

    t00 = _unpack(rows[..., 0])
    t10 = _unpack(rows[..., 1])
    t01 = _unpack(rows[..., 2])
    t11 = _unpack(rows[..., 3])
    s0 = (
        t00 * ((1 - fx) * (1 - fy))[None]
        + t10 * (fx * (1 - fy))[None]
        + t01 * ((1 - fx) * fy)[None]
        + t11 * (fx * fy)[None]
    )
    if not trilinear:
        return jnp.where((layer >= 0)[None], s0, 1.0)

    # level l0+1 sample from the packed 3x3 (weight 0 when l0 == last level)
    f = (lod - l0.astype(jnp.float32))
    s1sz = atlas.level_size[jnp.minimum(l0 + 1, n_levels - 1)].astype(jnp.float32)
    tx1 = uf * s1sz - 0.5
    ty1 = vf * s1sz - 0.5
    x1f = jnp.floor(tx1)
    y1f = jnp.floor(ty1)
    fx1 = tx1 - x1f
    fy1 = ty1 - y1f
    # offset of the l1 anchor within the stored 3x3: dx in {0,1}
    dx = (x1f - (jnp.floor(x0f / 2) - 1)).astype(jnp.int32)
    dy = (y1f - (jnp.floor(y0f / 2) - 1)).astype(jnp.int32)

    def n3(j, i):  # row j (y), col i (x) of the 3x3
        base = 4 + 3 * j + i
        return rows[..., base]

    def tap(ddy, ddx):
        # select from the 3x3 at (dy+ddy, dx+ddx); dy,dx in {0,1}
        w_ = jnp.where(
            (dy + ddy) == 0,
            jnp.where((dx + ddx) == 0, n3(0, 0), jnp.where((dx + ddx) == 1, n3(0, 1), n3(0, 2))),
            jnp.where(
                (dy + ddy) == 1,
                jnp.where((dx + ddx) == 0, n3(1, 0), jnp.where((dx + ddx) == 1, n3(1, 1), n3(1, 2))),
                jnp.where((dx + ddx) == 0, n3(2, 0), jnp.where((dx + ddx) == 1, n3(2, 1), n3(2, 2))),
            ),
        )
        return _unpack(w_)

    s1 = (
        tap(0, 0) * ((1 - fx1) * (1 - fy1))[None]
        + tap(0, 1) * (fx1 * (1 - fy1))[None]
        + tap(1, 0) * ((1 - fx1) * fy1)[None]
        + tap(1, 1) * (fx1 * fy1)[None]
    )
    out = s0 * (1 - f)[None] + s1 * f[None]
    return jnp.where((layer >= 0)[None], out, 1.0)


def main():
    scene = sponza_like_scene(100)
    atlas = scene.atlas
    quad = jnp.asarray(build_quad_table_np(atlas))
    print("quad table:", quad.shape, quad.nbytes / 1e6, "MB logical")

    rng = np.random.default_rng(0)
    n = 1920 * 1088
    shape = (1088, 1920)
    layer = jnp.asarray(rng.integers(-1, int(np.asarray(atlas.n_layers)), size=shape, dtype=np.int64), jnp.int32)
    u = jnp.asarray(rng.uniform(-1, 2, size=shape), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 2, size=shape), jnp.float32)
    lod = jnp.asarray(rng.uniform(0, atlas.num_levels - 0.4, size=shape), jnp.float32)

    for tri in (False, True):
        ref = jax.jit(lambda l, u, v, d: sample_atlas_cf(atlas, l, u, v, d, trilinear=tri))
        new = jax.jit(lambda l, u, v, d: sample_quad(atlas, quad, l, u, v, d, trilinear=tri))
        r = np.asarray(ref(layer, u, v, lod))
        q = np.asarray(new(layer, u, v, lod))
        err = np.abs(r - q).max()
        print(f"trilinear={tri} max err {err:.2e}")
        for name, f in (("ref", ref), ("quad", new)):
            out = f(layer, u, v, lod); jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(layer, u, v, lod)
            jax.block_until_ready(out)
            print(f"  {name} trilinear={tri}: {(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()

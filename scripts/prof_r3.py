"""Round-3 candidate microbenches: sort replacement + shade light loop.

The round-2 split is geometry 38 / raster 28 / shade 22 ms. Geometry's
argsort(262k) exists only to (a) put survivors first (compaction) and
(b) give the raster bins spatial coherence. Candidate: sort INSTANCES by
screen-Morton before expansion (16k keys instead of 262k) and compact
survivors with a linear cumsum+scatter. This measures the pieces.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.cull import _morton2d


def timeit(name, fn, *args, iters=10):
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
    key0 = jax.random.PRNGKey(0)
    keys = jax.random.randint(key0, (E,), 0, 1 << 20, jnp.uint32)
    mask = jax.random.uniform(jax.random.PRNGKey(1), (E,)) < 0.4
    keys = jnp.where(mask, keys, jnp.uint32(0xFFFFFFFF))

    def argsort_262k(k):
        return jnp.argsort(k, stable=True)[:TRI_CAPACITY]

    timeit("argsort 262k u32 (current)", argsort_262k, keys)

    def sortpair_262k(k):
        v = jnp.arange(k.shape[0], dtype=jnp.int32)
        return jax.lax.sort((k, v), num_keys=1)[1][:TRI_CAPACITY]

    timeit("lax.sort (key,idx) 262k", sortpair_262k, keys)

    def compact_262k(m):
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        dest = jnp.where(m, pos, E)
        src = jnp.arange(E, dtype=jnp.int32)
        perm = jnp.zeros((TRI_CAPACITY,), jnp.int32).at[
            jnp.minimum(dest, TRI_CAPACITY)
        ].set(src, mode="drop")
        return perm

    timeit("cumsum+scatter compaction 262k", compact_262k, mask)

    # instance-level Morton sort (16384 capacity table)
    NI = 16384
    ik = jax.random.randint(key0, (NI,), 0, 1 << 20, jnp.uint32)

    def inst_sort(k):
        return jnp.argsort(k, stable=True)

    timeit("argsort 16k u32 (instance sort)", inst_sort, ik)

    # permute the per-instance columns (what the cull pass would gather)
    cols = jax.random.normal(key0, (NI, 36), jnp.float32)

    def permute_cols(perm, cols):
        return cols[perm]

    perm16 = jax.jit(inst_sort)(ik)
    timeit("permute (16k, 36) instance columns", permute_cols, perm16, cols)

    # --- shade: per-light GGX cost --------------------------------------
    from renderer_tpu.ops.pbr import _ggx_brdf

    H, W = HEIGHT, WIDTH
    n = jax.random.normal(key0, (3, H, W), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (3, H, W), jnp.float32)
    alb = jax.random.uniform(jax.random.PRNGKey(3), (3, H, W), jnp.float32)
    met = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W), jnp.float32)
    rgh = jax.random.uniform(jax.random.PRNGKey(5), (1, H, W), jnp.float32)

    def nrm(x):
        return x / jnp.sqrt(jnp.sum(x * x, 0, keepdims=True))

    n = jax.jit(nrm)(n)
    v = jax.jit(nrm)(v)

    def ggx_k(k):
        def f(n, v, alb, met, rgh):
            c = jnp.zeros_like(alb)
            for i in range(k):
                l = nrm(v + 0.1 * i)
                c = c + _ggx_brdf(n, v, l, alb, met, rgh)
            return c
        return f

    for k in (1, 2, 4):
        timeit(f"GGX light loop x{k} @1080p", ggx_k(k), n, v, alb, met, rgh)

    # --- channel-last output cost (moveaxis at the jit boundary) ---------
    cf = jax.random.normal(key0, (3, H, W), jnp.float32)

    def to_cl(cf):
        return jnp.moveaxis(cf, 0, -1)

    timeit("moveaxis (3,H,W) -> (H,W,3) output", to_cl, cf)

    def ident_cf(cf):
        return cf * 1.0000001

    timeit("identity (3,H,W) channel-first output", ident_cf, cf)

    # --- raster XLA prologue (setup + binning, no kernel) ----------------
    from renderer_tpu.ops.raster_pallas import _bin_blocks, _setup_tri_data
    from renderer_tpu.passes.pipeline import PipelineConfig
    from renderer_tpu.runtime import Renderer

    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    r = Renderer(scene, cfg, outputs=("soup",))
    soup = r.render(make_camera(0.35))["soup"]

    def prologue(clip, valid):
        tri_data, bbox_ok = _setup_tri_data(clip, valid, WIDTH, HEIGHT, True)
        bl, bc = _bin_blocks(bbox_ok, clip.shape[0], WIDTH, HEIGHT)
        return tri_data, bl, bc

    timeit("raster XLA prologue (setup+bin)", prologue, soup.clip, soup.valid)

    def setup_only(clip, valid):
        return _setup_tri_data(clip, valid, WIDTH, HEIGHT, True)[0]

    timeit("raster setup_tri_data only", setup_only, soup.clip, soup.valid)

    # exact per-triangle coverage bitmask build (the round-3 candidate)
    def bitmask_bin(clip, valid):
        tri_data, bbox_ok = _setup_tri_data(clip, valid, WIDTH, HEIGHT, True)
        xmin, xmax, ymin, ymax, ok = bbox_ok
        n_ty, n_tx = HEIGHT // 32, WIDTH // 128
        t = clip.shape[0]
        ty = jnp.arange(n_ty, dtype=jnp.float32)[:, None, None]
        tx = jnp.arange(n_tx, dtype=jnp.float32)[:, None, None]
        hit_y = (ymin[None, None, :] <= (ty + 1) * 32) & (ymax[None, None, :] >= ty * 32)
        hit_x = (xmin[None, None, :] <= (tx + 1) * 128) & (xmax[None, None, :] >= tx * 128)
        # (n_ty, 1, T) & (1, n_tx, T) -> per-tile coverage; bitpack 32s
        hit = hit_y.reshape(n_ty, 1, t) & hit_x.reshape(1, n_tx, t) & ok[None, None, :]
        words = jnp.sum(
            hit.reshape(n_ty, n_tx, t // 32, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, None, None, :],
            axis=-1,
        )  # (n_ty, n_tx, T//32) u32
        return words

    timeit("exact per-tri coverage bitmask build", bitmask_bin, soup.clip, soup.valid)


if __name__ == "__main__":
    main()

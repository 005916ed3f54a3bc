"""Count raster-kernel work terms at the bench frame: block visits (scalar
loop trips x BLOCK), bbox-pass hits (full-tile vector evaluations), and
simple-block fraction — decides which term bounds the kernel."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import raster_pallas as rp
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    r = Renderer(scene, cfg, outputs=("soup",))
    soup = r.render(make_camera(0.35))["soup"]
    clip, valid = soup.clip, soup.valid

    @jax.jit
    def stats(clip, valid):
        t_cap = clip.shape[0]
        n_blocks = t_cap // rp.BLOCK
        tri_data, bbox_ok, simple = rp._setup_tri_data(
            clip, valid, WIDTH, HEIGHT, True
        )
        block_list, block_count = rp._bin_blocks(bbox_ok, t_cap, WIDTH, HEIGHT)
        xmin, xmax, ymin, ymax, ok = bbox_ok
        # per-triangle tile span (hits if its block is visited)
        tx0 = jnp.clip(jnp.floor(xmin / rp.TILE_W), 0, WIDTH // rp.TILE_W - 1)
        tx1 = jnp.clip(jnp.floor(xmax / rp.TILE_W), 0, WIDTH // rp.TILE_W - 1)
        ty0 = jnp.clip(jnp.floor(ymin / rp.TILE_H), 0, HEIGHT // rp.TILE_H - 1)
        ty1 = jnp.clip(jnp.floor(ymax / rp.TILE_H), 0, HEIGHT // rp.TILE_H - 1)
        span = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
        hits = jnp.sum(jnp.where(ok, span, 0))
        visits = jnp.sum(jnp.maximum(block_count, 0))
        overflow = jnp.sum((block_count < 0).astype(jnp.int32))
        blk_simple = jnp.all(
            (simple | ~ok).reshape(n_blocks, rp.BLOCK), axis=1
        )
        blk_live = jnp.any(ok.reshape(n_blocks, rp.BLOCK), axis=1)
        return (hits, visits, overflow,
                jnp.sum(blk_simple & blk_live), jnp.sum(blk_live))

    h, v, o, s, l = (int(x) for x in jax.device_get(stats(clip, valid)))
    print(f"bbox-pass hits (vector tile evals): {h}")
    print(f"block visits: {v}  (scalar iters = {v * rp.BLOCK})")
    print(f"overflow tiles: {o}")
    print(f"simple live blocks: {s}/{l}")


if __name__ == "__main__":
    main()

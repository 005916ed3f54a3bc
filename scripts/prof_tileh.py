"""TILE_H re-tune at the current kernel state (chained timing)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops.raster_pallas import TILE_H, rasterize_pallas
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache
from scripts.timing import timeit_chained


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
    clip = jax.block_until_ready(soup.clip)
    valid = soup.valid
    del r

    @jax.jit
    def f(s, c=clip, v=valid):
        vis = rasterize_pallas(c + s * 0.0, v, WIDTH, HEIGHT, with_bary=False)
        return vis.depth

    ms = timeit_chained(lambda s: f(s), n=20)
    print(f"TILE_H={TILE_H}: standalone raster {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

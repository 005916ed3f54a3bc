"""A/B the raster kernel BLOCK size at the bench scene (monkeypatched)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
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
    clip = jax.block_until_ready(soup.clip)
    valid = soup.valid

    ref = None
    for blk in (int(a) for a in sys.argv[1:] or (64, 32, 128)):
        rp.BLOCK = blk
        f = jax.jit(
            lambda c, v: rp.rasterize_pallas(
                c, v, WIDTH, HEIGHT, with_bary=False
            ).tri_id
        )
        out = jax.block_until_ready(f(clip, valid))
        if ref is None:
            ref = np.asarray(out)
        else:
            assert (np.asarray(out) == ref).all(), f"MISMATCH at BLOCK={blk}"
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(clip, valid)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"BLOCK={blk:4d}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

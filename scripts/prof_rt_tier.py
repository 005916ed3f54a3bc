"""Production rt tier measurement (VERDICT r4 item 4).

Times the bench frame with the `rt` switch (light-space grid-traced
shadows, ops/rt_grid.py) at rt_scale = 1 (exact full-res), 2, and 4, and
measures each reduced tier's min-over-poses PSNR vs the exact rt frame.
The bench's base (shadow-mapped tier off, rt on) config otherwise.

Run alone on the TPU.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bench import (
    GATE_ANGLES, HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera,
    psnr_min,
)
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache

import time

FRAMES = 8  # rt_scale=1 runs ~0.4 s/frame; keep the orbit short


def measure(scene, cfg):
    r = Renderer(scene, cfg, outputs=("image",))
    r.set_config(rt=True)
    r.apply_config_now()
    out = r.render(make_camera(0.3))
    float(np.asarray(out["image"][0, 0, 0]))
    t0 = time.perf_counter()
    for k in range(FRAMES):
        out = r.render(make_camera(0.3 + 0.01 * k))
    float(np.asarray(out["image"][0, 0, 0]))
    dt = (time.perf_counter() - t0) / FRAMES
    frames = {}
    for a in GATE_ANGLES:
        img = np.asarray(r.render(make_camera(a))["image"])
        frames[a] = np.clip(img, 0.0, 1.0)
    del r
    return dt, frames


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    base = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True, aa="edge",
        trilinear=False,
        # rt traces need the full 2D lattice; fix is auto-skipped, keep
        # full-rate shading so the PSNR isolates the rt tier itself
        shade_rate="full", shade_fix=False,
    )
    frames_exact = None
    for s in (1, 2, 4):
        cfg = dataclasses.replace(base, rt_scale=s)
        dt, frames = measure(scene, cfg)
        if s == 1:
            frames_exact = frames
            psnr = float("inf")
        else:
            psnr = psnr_min(frames_exact, frames)
        print(f"rt_scale={s}: {dt*1e3:7.2f} ms/frame ({1.0/dt:5.2f} FPS)  "
              f"min-pose PSNR vs exact rt: {psnr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()

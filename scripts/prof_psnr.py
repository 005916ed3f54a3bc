"""Decompose the checkerboard-gate PSNR drop (41.0 single-pose r3 ->
34.8 min-over-poses with normal maps + AA): which factor costs how much?

Renders cb+fix vs exact at the 3 gate poses for each feature variant and
prints per-pose + min PSNR."""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import numpy as np

from bench import GATE_ANGLES, HEIGHT, TRI_CAPACITY, WIDTH, N_INSTANCES, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def frames_for(scene, cfg, shadows=False):
    r = Renderer(scene, cfg, outputs=("image",))
    if shadows:
        r.set_config(shadows=True)
        r.apply_config_now()
    out = {}
    for a in GATE_ANGLES:
        out[a] = np.clip(np.asarray(r.render(make_camera(a))["image"]), 0, 1)
    del r
    return out


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    base = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", trilinear=False,
    )
    variants = {
        "nm=0 aa=0": dataclasses.replace(base, enable_normal_maps=False, aa="none"),
        "nm=0 aa=1": dataclasses.replace(base, enable_normal_maps=False, aa="edge"),
        "nm=1 aa=0": dataclasses.replace(base, enable_normal_maps=True, aa="none"),
        "nm=1 aa=1": dataclasses.replace(base, enable_normal_maps=True, aa="edge"),
    }
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, cfg in variants.items():
        if only and only not in name.replace(" ", ""):
            continue
        exact = frames_for(scene, cfg)
        cb = frames_for(
            scene,
            dataclasses.replace(cfg, shade_rate="checkerboard", shade_fix=True),
        )
        psnrs = []
        for a in GATE_ANGLES:
            mse = float(np.mean(np.square(exact[a] - cb[a])))
            psnrs.append(10.0 * math.log10(1.0 / max(mse, 1e-12)))
        print(f"{name}: per-pose {['%.1f' % p for p in psnrs]} "
              f"min {min(psnrs):.1f} dB", flush=True)


if __name__ == "__main__":
    main()

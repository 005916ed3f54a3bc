"""Texture/bindless envelope demonstration (VERDICT r4 item 5/6).

The reference's bindless design constant is 2x3072 partially-bound texture
slots (renderer.rs:243-248); the bench scene had carried only 4 color
textures + 2 normal maps. Two measurements:

1. SAMPLER SCALING: the bench frame (cb+fix, normal maps, edge AA) at
   n_textures = 2 / 64 / 192 distinct 256^2 textures (so 4 / 128 / 384
   atlas layers incl. normal maps). The quad-table sampler gathers from a
   flat layer address space — ONE row-gather per pixel regardless of how
   many layers exist — so the expectation is NO cliff: cost is per-pixel,
   not per-layer (the TPU-native analogue of descriptor-indexed bindless).

2. STREAMING UNDER PRESSURE: 64 preallocated layer slots cycled by
   request_texture/release_texture at the per-frame budget while the
   orbit renders — the descriptor-slot recycling of the reference's
   scene_loader (<=8 uploads/frame, scene_loader.rs:166). Reports
   ms/frame with and without the churn.

Run alone on the TPU (PERF.md measurement hygiene).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache

FRAMES = 20


def bench_cfg(**kw):
    return PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True, aa="edge",
        trilinear=False, shade_rate="checkerboard", shade_fix=True, **kw
    )


def timed_orbit(r, scene=None, frames=FRAMES, streamer=None, churn=0):
    out = r.render(make_camera(0.3), scene=scene)
    float(np.asarray(out["image"][0, 0, 0]))
    rng = np.random.default_rng(7)
    live = []
    t0 = time.perf_counter()
    for k in range(frames):
        if streamer is not None and churn:
            for _ in range(churn):
                if len(live) >= 48:  # recycle under pressure
                    streamer.release_texture(live.pop(0))
                img = rng.integers(0, 255, (256, 256, 4), np.uint8)
                live.append(streamer.request_texture(img))
            streamer.pump()
            scene = streamer.scene
        out = r.render(make_camera(0.3 + 0.01 * k), scene=scene)
    float(np.asarray(out["image"][0, 0, 0]))
    return (time.perf_counter() - t0) / frames * 1e3


def main():
    enable_persistent_cache()

    # 1. sampler scaling with distinct-texture count
    for n_tex in (2, 64, 192):
        scene = sponza_like_scene(N_INSTANCES, n_textures=n_tex)
        layers = int(np.asarray(scene.atlas.n_layers))
        r = Renderer(scene, bench_cfg(), outputs=("image",))
        ms = timed_orbit(r)
        print(f"n_textures={n_tex:4d} ({layers:4d} atlas layers): "
              f"{ms:6.2f} ms/frame ({1e3/ms:.1f} FPS)", flush=True)
        del r

    # 2. streaming under pressure: 64 extra slots, 8 requests/frame with
    # recycling, decode on the worker pool, budgeted uploads
    from renderer_tpu.runtime.streaming import SceneStreamer

    scene = sponza_like_scene(N_INSTANCES, texture_slots=64)
    r = Renderer(scene, bench_cfg(), outputs=("image",))
    ms_base = timed_orbit(r, scene=scene)
    streamer = SceneStreamer(scene, budget=8)
    ms_churn = timed_orbit(r, scene=streamer.scene, streamer=streamer, churn=8)
    print(f"streaming idle: {ms_base:6.2f} ms/frame; "
          f"8 texture uploads/frame with slot recycling: {ms_churn:6.2f} "
          f"ms/frame (delta {ms_churn - ms_base:+.2f})",
          flush=True)
    print(f"streamer stats: {streamer.stats}", flush=True)
    streamer.close()


if __name__ == "__main__":
    main()

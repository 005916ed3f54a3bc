"""VERDICT r3 item 7: scale past 500k visible triangles + an occlusion win.

Two measured configs on the real TPU:
  A. dense field: sponza_like_scene(10000, with_lods=False) at 1080p with
     tri_capacity 2^19 — visible-triangle count, bin-overflow counters,
     and frame time at >=500k visible triangles.
  B. city blocks (models/scenes.city_scene): street-level camera inside a
     20x20 grid of ~1.7k-tri buildings — occlusion_culling OFF vs ON A/B
     (the design point where two-pass hi-z must WIN).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from renderer_tpu.models import sponza_like_scene
from renderer_tpu.models.scenes import city_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache

WIDTH, HEIGHT = 1920, 1088
FRAMES = 20


def make_camera(pos, yaw=0.0, pitch=-0.12):
    from renderer_tpu.mathx.camera import Camera

    def axis_angle(ax, a):
        s = math.sin(a / 2.0)
        return np.array(
            [math.cos(a / 2.0), ax[0] * s, ax[1] * s, ax[2] * s], np.float32
        )

    qa = axis_angle((0.0, 1.0, 0.0), yaw)
    qb = axis_angle((1.0, 0.0, 0.0), pitch)
    w1, x1, y1, z1 = qa
    w2, x2, y2, z2 = qb
    rot = np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        np.float32,
    )
    return Camera(
        position=np.asarray(pos, np.float32), rotation=rot,
        fov_y=np.float32(0.9), aspect=np.float32(WIDTH / HEIGHT),
        near=np.float32(0.1), far=np.float32(400.0),
    )


def timed(renderer, cams):
    out = renderer.render(cams[0])
    float(np.asarray(out["image"][0, 0, 0]))
    t0 = time.perf_counter()
    for c in cams:
        out = renderer.render(c)
    float(np.asarray(out["image"][0, 0, 0]))
    return (time.perf_counter() - t0) / len(cams) * 1e3


def dense_field():
    scene = sponza_like_scene(10000, with_lods=False)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=1 << 19,
        use_pallas=True, shading="pbr", enable_normal_maps=True,
        aa="edge", trilinear=False,
    )
    cams = [make_camera((18 * math.sin(0.3 + 0.01 * k), 6.0,
                         18 * math.cos(0.3 + 0.01 * k)),
                        yaw=0.3 + 0.01 * k, pitch=-0.3)
            for k in range(FRAMES)]

    probe = Renderer(scene, cfg, outputs=("soup",))
    counts, overflow = [], 0
    from renderer_tpu.ops.raster_pallas import bin_overflow_tiles

    for c in cams[::5]:
        soup = probe.render(c)["soup"]
        counts.append(int(np.asarray(soup.count)))
        overflow += int(bin_overflow_tiles(soup.clip, soup.valid, WIDTH, HEIGHT))
    del probe
    print(f"dense field visible tris: mean {np.mean(counts):.0f} "
          f"min {min(counts)} max {max(counts)}; overflowed tiles {overflow}",
          flush=True)

    r = Renderer(scene, cfg, outputs=("image",))
    ms = timed(r, cams)
    print(f"dense field frame: {ms:.2f} ms ({1e3/ms:.1f} FPS) "
          f"@ {np.mean(counts)/1e3:.0f}k visible tris", flush=True)
    del r


def city():
    scene = city_scene(20)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=1 << 19,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        aa="edge", trilinear=False,
    )
    # street-level walk along a canyon between building rows
    cams = [make_camera((0.0, 2.0, 70.0 - 1.5 * k), yaw=0.0, pitch=0.0)
            for k in range(FRAMES)]

    probe = Renderer(scene, cfg, outputs=("soup",))
    counts = [int(np.asarray(probe.render(c)["soup"].count)) for c in cams[::5]]
    print(f"city visible tris (frustum only): mean {np.mean(counts):.0f}",
          flush=True)
    del probe
    probe = Renderer(scene, cfg, outputs=("soup",))
    probe.set_config(occlusion_culling=True)
    probe.apply_config_now()
    occ_counts = [
        int(np.asarray(probe.render(c)["soup"].count)) for c in cams[:8]
    ]
    print(f"city visible tris after occlusion (warmup then steady): "
          f"{occ_counts}", flush=True)
    del probe

    # The honest A/B pairs each mode with the capacity a production config
    # would budget for it: in a fixed-capacity static-shape pipeline most
    # per-frame cost scales with CAPACITY, so occlusion culling's dividend
    # is the SMALLER budget it makes safe (17k steady visible vs 127k
    # frustum-visible), not fewer triangles through the same buffers.
    import dataclasses

    for occ, cap in ((False, 1 << 18), (True, 1 << 16)):
        cfg_o = dataclasses.replace(cfg, tri_capacity=cap)
        r = Renderer(scene, cfg_o, outputs=("image",))
        if occ:
            r.set_config(occlusion_culling=True)
            r.apply_config_now()
        ms = timed(r, cams)
        print(f"city occlusion={occ} capacity={cap >> 10}k: {ms:.2f} ms "
              f"({1e3/ms:.1f} FPS)", flush=True)
        del r


def dense_auto():
    """VERDICT r4 item 6: the interactive high-density tier — >=256k visible
    triangles at >=15 FPS with NO operator-set capacity: the
    AutoCapacityRenderer ladder budgets tri_capacity from the measured
    expansion demand (runtime/autocap.py)."""
    from renderer_tpu.runtime import AutoCapacityRenderer

    scene = sponza_like_scene(5000, with_lods=False)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=1 << 14,  # ladder overrides
        use_pallas=True, shading="pbr", enable_normal_maps=True,
        aa="edge", trilinear=False,
        shade_rate="checkerboard", shade_fix=True,
    )
    cams = [make_camera((18 * math.sin(0.3 + 0.01 * k), 6.0,
                         18 * math.cos(0.3 + 0.01 * k)),
                        yaw=0.3 + 0.01 * k, pitch=-0.3)
            for k in range(FRAMES)]
    r = AutoCapacityRenderer(
        scene, cfg, ladder=(1 << 16, 1 << 17, 1 << 18, 3 << 17, 1 << 19),
        check_every=2, outputs=("image", "soup"),
    )
    # settle the ladder (each new tier compiles once)
    for k in range(10):
        r.render(cams[k % len(cams)])
        print(f"  settle frame {k}: capacity {r.capacity >> 10}k "
              f"demand {r.stats['last_demand']}", flush=True)
    settled = r.capacity
    # the demand check is a host fetch (sync); at steady state 1-in-8
    # frames is plenty and keeps the timed orbit pipelined
    r.check_every = 8

    from renderer_tpu.ops.raster_pallas import bin_overflow_tiles

    counts, overflow = [], 0
    for c in cams[::5]:
        out = r.render(c)
        soup = out["soup"]
        counts.append(int(np.asarray(soup.count)))
        overflow += int(bin_overflow_tiles(soup.clip, soup.valid, WIDTH, HEIGHT))
    ms = timed(r, cams)
    assert r.capacity == settled, "ladder thrashed during the timed orbit"
    print(f"auto-capacity dense tier: settled {settled >> 10}k capacity "
          f"(no operator knob), {np.mean(counts)/1e3:.0f}k visible tris, "
          f"overflowed tiles {overflow}, {ms:.2f} ms ({1e3/ms:.1f} FPS)",
          flush=True)


if __name__ == "__main__":
    enable_persistent_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "dc"
    if "d" in which:
        dense_field()
    if "c" in which:
        city()
    if "a" in which:
        dense_auto()

"""Headline benchmark: Sponza-class instanced scene at 1080p on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}

Baseline target (BASELINE.md): >= 60 FPS at 1080p for a Sponza-class scene
with 10k frustum-culled instances on one TPU v5e chip. Also reports Mtris/s.
"""

import json
import math
import time


WIDTH, HEIGHT = 1920, 1088  # 1080p padded to the 16-row tile size
N_INSTANCES = 10000
TRI_CAPACITY = 1 << 17  # post-cull capacity (expansion capacity is 2x this)
FRAMES = 30
TARGET_FPS = 60.0


def make_camera(angle: float):
    # Pure-numpy camera construction: eager jnp quat math here cost a
    # measured 4.2 ms/frame in tunnel dispatches; host math is free and the
    # jit call moves the six tiny arrays in one transfer.
    import numpy as np

    from renderer_tpu.mathx.camera import Camera

    r = 18.0
    pos = np.array([r * math.sin(angle), 6.0, r * math.cos(angle)], np.float32)

    def axis_angle(ax, a):
        s = math.sin(a / 2.0)
        return np.array(
            [math.cos(a / 2.0), ax[0] * s, ax[1] * s, ax[2] * s], np.float32
        )

    qa = axis_angle((0.0, 1.0, 0.0), angle)
    qb = axis_angle((1.0, 0.0, 0.0), -0.3)
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
        position=pos,
        rotation=rot,
        fov_y=np.float32(0.9),
        aspect=np.float32(WIDTH / HEIGHT),
        near=np.float32(0.1),
        far=np.float32(200.0),
    )


def main():
    import jax
    import numpy as np

    from renderer_tpu.models import sponza_like_scene
    from renderer_tpu.passes.pipeline import PipelineConfig
    from renderer_tpu.runtime import Renderer

    platform = jax.devices()[0].platform
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH,
        height=HEIGHT,
        tri_capacity=TRI_CAPACITY,
        use_pallas=(platform == "tpu"),
        shading="pbr",
        enable_normal_maps=False,  # the scene carries no normal maps
        trilinear=False,  # bilinear + nearest mip (GPU 'performance' filtering)
    )
    renderer = Renderer(scene, cfg, outputs=("image",))

    # visible-triangle count for Mtris/s: averaged over the timed orbit's
    # camera range (a single-angle probe over/understates by a few %).
    # The same soups feed the raster bin-overflow check: an overflowed tile
    # silently degrades to walk-all-blocks (raster_pallas.py), so the bench
    # must warn — a clean FPS number with overflowing bins is misleading.
    probe = Renderer(scene, cfg, outputs=("soup",))
    probe_angles = [0.3 + 0.01 * k for k in range(0, FRAMES, max(1, FRAMES // 5))]
    counts = []
    overflow = 0
    for a in probe_angles:
        soup = probe.render(make_camera(a))["soup"]
        counts.append(int(np.asarray(soup.count)))
        if cfg.use_pallas:
            from renderer_tpu.ops.raster_pallas import bin_overflow_tiles

            overflow += int(
                bin_overflow_tiles(soup.clip, soup.valid, WIDTH, HEIGHT)
            )
    tri_count = float(np.mean(counts))
    if overflow:
        import sys

        print(
            f"WARNING: {overflow} raster tile bin-lists overflowed across "
            f"{len(probe_angles)} probe frames (walk-all fallback active)",
            file=sys.stderr,
        )
    del probe

    # warmup/compile
    out = renderer.render(make_camera(0.3))
    jax.block_until_ready(out["image"])

    t0 = time.perf_counter()
    for k in range(FRAMES):
        out = renderer.render(make_camera(0.3 + 0.01 * k))
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / FRAMES
    fps = 1.0 / dt
    mtris = tri_count * fps / 1e6

    print(
        json.dumps(
            {
                "metric": f"sponza_like_{N_INSTANCES}inst_{WIDTH}x{HEIGHT}_fps_{platform}",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "mtris_per_sec": round(mtris, 1),
                "visible_triangles": int(tri_count),
                "frame_ms": round(dt * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

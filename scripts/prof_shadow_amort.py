"""VERDICT r3 item 2: the reference shadow ENVELOPE, amortized.

The reference re-renders 16 slots x 4096^2 every frame on a desktop GPU
(shadow_mapping.rs:22-24); a cold render of that envelope here is ~690 ms
(PERF.md session 5b). The amortized atlas (shadow_cache +
shadow_update_budget) makes the envelope INTERACTIVE: each frame re-renders
at most B dirty slots, so a static scene converges to zero raster work and
a moved light costs one slot-render amortized over the next frames.

Measures at 16 slots x 2048^2 (and optionally 4096^2), budget 1:
  - convergence: per-frame ms for the first 16+ frames (one slot each)
  - steady state: ms/frame once all slots are clean
  - a moved light: the next frame re-renders exactly its slot
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.scene.types import SceneLimits
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    limits = SceneLimits(
        max_instances=16384, max_vertices=1 << 16, max_triangles=1 << 16,
        max_materials=64, max_lights=n_slots,
    )
    scene = sponza_like_scene(N_INSTANCES, limits=limits)
    rng = np.random.default_rng(3)
    L = n_slots
    d = rng.normal(size=(L, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.3
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[0] = np.asarray((-0.5, -1.0, -0.3), np.float32) / np.linalg.norm((-0.5, -1.0, -0.3))
    lights = scene.lights._replace(
        position=jnp.asarray(d),
        color=jnp.ones((L, 3), jnp.float32),
        intensity=jnp.full((L,), 1.2, jnp.float32),
        directional=jnp.ones((L,), bool),
        shadow_slot=jnp.arange(L, dtype=jnp.int32),
        alive=jnp.ones((L,), bool),
        count=jnp.int32(L),
    )
    scene = scene._replace(lights=lights)

    progressive = int(os.environ.get("PROG", "1"))
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True, aa="edge",
        trilinear=False, shade_rate="checkerboard", shade_fix=True,
        shadow_slots=n_slots, shadow_size=size,
        shadow_update_budget=1,
        shadow_progressive=progressive,
        # apples-to-apples with the reference envelope: it RENDERS 16 slots
        # per frame but its fragment shader samples exactly 2 lights
        # (gltf_mesh.frag hard-codes 2) — shading all 16 per pixel measured
        # 310 ms/frame of pure lookup cost no atlas scheme can hide
        shade_light_slots=2,
    )
    r = Renderer(scene, cfg, outputs=("image",))
    r.set_config(shadows=True)
    r.apply_config_now()

    def frame(k):
        t0 = time.perf_counter()
        out = r.render(make_camera(0.3 + 0.003 * k))
        float(np.asarray(out["image"][0, 0, 0]))  # host fetch = real sync
        return (time.perf_counter() - t0) * 1e3

    ms0 = frame(0)  # compile
    # budget 1 commits ONE unit per frame: n_slots (x progressive bands)
    # units must all render before "steady state" means anything (an
    # unconverged orbit measures constant convergence churn — the r5
    # first-run trap: steady == convergence == one band render per frame)
    n_units = n_slots * progressive
    conv = [frame(k + 1) for k in range(n_units + 2)]
    print(f"compile+first {ms0:.0f} ms; convergence over {n_units} units "
          f"(budget 1): first 8 {['%.0f' % m for m in conv[:8]]} last 4 "
          f"{['%.0f' % m for m in conv[-4:]]}", flush=True)
    sig_now = np.asarray(r.state["shadow_cache"][1])
    assert not np.isnan(sig_now).any(), "units still unconverged"

    # steady state: all slots clean -> chained orbit
    out = r.render(make_camera(0.5))
    float(np.asarray(out["image"][0, 0, 0]))
    t0 = time.perf_counter()
    n = 20
    for k in range(n):
        out = r.render(make_camera(0.5 + 0.01 * k))
    float(np.asarray(out["image"][0, 0, 0]))
    steady = (time.perf_counter() - t0) / n * 1e3
    print(f"steady state {n_slots}x{size}^2 amortized: {steady:.2f} ms/frame "
          f"({1e3/steady:.1f} FPS)", flush=True)

    # move light 7: exactly one slot re-renders next frame
    sig_before = np.asarray(r.state["shadow_cache"][1]).copy()
    moved = scene._replace(lights=lights._replace(
        position=lights.position.at[7].set(jnp.asarray([0.1, -1.0, 0.6]))
    ))
    t0 = time.perf_counter()
    out = r.render(make_camera(0.55), scene=moved)
    float(np.asarray(out["image"][0, 0, 0]))
    ms = (time.perf_counter() - t0) * 1e3
    sig_after = np.asarray(r.state["shadow_cache"][1])
    # NaN-aware compare: a never-rendered unit's stored NaN must not read
    # as "changed" (NaN != NaN)
    diff = (sig_before != sig_after) & ~(
        np.isnan(sig_before) & np.isnan(sig_after)
    )
    changed = np.nonzero(diff.reshape(sig_before.shape[0], -1).any(axis=-1))[0]
    print(f"moved light 7: next frame {ms:.1f} ms; refreshed slots {changed}",
          flush=True)

    # ORBITING light (VERDICT r4 item 2 "Done" criterion): light 7 moves
    # EVERY frame — per-band signatures + budget-1 progressive renders
    # bound the per-frame cost at ~1/progressive of a slot re-render
    if os.environ.get("ORBIT", "0") == "1":
        import math as _m

        pos_np = np.asarray(lights.position).copy()

        def orbit_scene(k):
            # pure-numpy light table per frame (PERF rule: no eager jnp)
            a = 0.25 * k
            d = np.asarray(
                [0.6 * _m.sin(a), -1.0, 0.6 * _m.cos(a)], np.float32
            )
            p = pos_np.copy()
            p[7] = d / np.linalg.norm(d)
            return scene._replace(lights=lights._replace(position=p))

        out = r.render(make_camera(0.6), scene=orbit_scene(0))
        float(np.asarray(out["image"][0, 0, 0]))
        n = 24
        t0 = time.perf_counter()
        for k in range(1, n + 1):
            out = r.render(make_camera(0.6 + 0.01 * k), scene=orbit_scene(k))
        float(np.asarray(out["image"][0, 0, 0]))
        ms_orbit = (time.perf_counter() - t0) / n * 1e3
        print(f"ORBITING light 7 ({n_slots}x{size}^2, progressive="
              f"{progressive}): {ms_orbit:.2f} ms/frame steady", flush=True)


if __name__ == "__main__":
    main()

"""Reference shadow envelope: 16 slots at >= 2048^2 through the Pallas atlas.

The reference renders a 4x4 atlas of 4096^2 D16 slots (shadow_mapping.rs:
22-24). This measures our per-light cull + expansion + Pallas depth raster
at that envelope on the bench scene: 16 lights (1 directional + 15 point),
each holding a slot, SxS slots.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import N_INSTANCES, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.shadow import light_matrices_cube, render_shadow_atlas_per_light
from renderer_tpu.scene.types import SceneLimits
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    caster_cap = 1 << 16

    limits = SceneLimits(
        max_instances=16384, max_vertices=1 << 16, max_triangles=1 << 16,
        max_materials=64, max_lights=n_slots,
    )
    scene = sponza_like_scene(N_INSTANCES, limits=limits)
    # rebuild the light table: n_slots directional lights, one slot each —
    # the reference renders 16 single-face per-light MVPs (its point lights
    # are single-face too, shadow_mapping.rs:259-312), so 16 one-pass slots
    # is the faithful envelope; our cube-map point slots cost 6 passes each
    # and are measured separately in the unit suite
    rng = np.random.default_rng(3)
    L = n_slots
    d = rng.normal(size=(L, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.3  # shine downward
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[0] = (-0.5, -1.0, -0.3)
    lights = scene.lights._replace(
        position=jnp.asarray(d),
        color=jnp.ones((L, 3), jnp.float32),
        intensity=jnp.full((L,), 2.0, jnp.float32),
        directional=jnp.ones((L,), bool),
        shadow_slot=jnp.arange(L, dtype=jnp.int32),
        alive=jnp.ones((L,), bool),
        count=jnp.int32(L),
    )
    scene = scene._replace(lights=lights)

    cam = make_camera(0.35)
    prepared = jax.jit(geometry.prepare_frame_columns)(scene, cam)
    model, lod = prepared[0], prepared[4]
    smin, smax = prepared[5], prepared[6]

    f = jax.jit(lambda s, m, mo, lo: render_shadow_atlas_per_light(
        s, light_matrices_cube(s.lights, smin, smax), s.lights, mo, lo,
        n_slots, size, caster_cap, use_pallas=True,
    ))
    t0 = time.time()
    atlas = jax.block_until_ready(f(scene, None, model, lod))
    print(f"compile {time.time()-t0:.0f}s; atlas {atlas.shape}", flush=True)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        atlas = f(scene, None, model, lod)
    jax.block_until_ready(atlas)
    ms = (time.time() - t0) / iters * 1e3
    cov = float(jnp.mean((atlas < 1.0).astype(jnp.float32)))
    print(f"{n_slots} slots x {size}^2 Pallas shadow atlas: {ms:.1f} ms "
          f"(coverage {cov:.1%}, caster_cap {caster_cap})", flush=True)


if __name__ == "__main__":
    main()

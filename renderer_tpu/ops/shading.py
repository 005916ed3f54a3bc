"""Deferred shading from the visibility buffer.

The fragment-shader stage of the reference (gltf_mesh.frag: PBR
metallic-roughness with GGX, normal mapping, shadows) re-expressed as batched
per-pixel array math over the whole framebuffer. v1 implements Lambert +
material base color; ops/pbr.py adds the full GGX model.
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_tpu.ops.geometry import TriangleSoup
from renderer_tpu.ops.raster_jax import VisibilityBuffer, interpolate
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.scene.types import Scene


def shade_lambert(
    vis: VisibilityBuffer,
    soup: TriangleSoup,
    scene: Scene,
    camera_pos: jnp.ndarray,
    viewproj_inv: jnp.ndarray = None,
    background=(0.05, 0.05, 0.08),
    ambient: float = 0.15,
    y0=0,
    full_height: int = None,
) -> jnp.ndarray:
    """Lambert-shaded linear RGB image (H, W, 3)."""
    from renderer_tpu.ops.geometry import unproject_depth

    covered = vis.tri_id != NO_TRIANGLE
    safe_id = jnp.maximum(vis.tri_id, 0)

    h, w = vis.depth.shape
    world = unproject_depth(
        vis.depth, viewproj_inv, w, h, y0=y0, full_height=full_height
    )  # (H, W, 3)
    normal = interpolate(vis, soup.normal)
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)

    inst = soup.instance[safe_id]  # (H, W)
    mat_id = scene.instances.material_id[inst]
    albedo = scene.materials.base_color_factor[mat_id][..., :3]  # (H, W, 3)
    emissive = scene.materials.emissive[mat_id]

    lights = scene.lights
    radiance = jnp.zeros_like(albedo) + ambient
    for li in range(lights.alive.shape[0]):
        on = lights.alive[li]
        to_light = jnp.where(
            lights.directional[li],
            -lights.position[li],
            lights.position[li] - world,
        )
        dist2 = jnp.sum(to_light * to_light, axis=-1, keepdims=True)
        l = to_light / jnp.sqrt(jnp.maximum(dist2, 1e-12))
        ndotl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
        atten = jnp.where(lights.directional[li], 1.0, 1.0 / jnp.maximum(dist2, 1e-4))
        contrib = ndotl * atten * lights.intensity[li] * lights.color[li]
        radiance = radiance + jnp.where(on, contrib, 0.0)

    color = albedo * radiance + emissive
    bg = jnp.asarray(background, jnp.float32)
    return jnp.where(covered[..., None], color, bg)


def shade_flat_instance(
    vis: VisibilityBuffer,
    soup: TriangleSoup,
    background=(0.05, 0.05, 0.08),
) -> jnp.ndarray:
    """Flat per-instance debug colors (the debug_aabbs view,
    ref: debug_aabb_renderer.rs constant-color boxes)."""
    from renderer_tpu.ops.debug import instance_debug_colors

    covered = vis.tri_id != NO_TRIANGLE
    safe_id = jnp.maximum(vis.tri_id, 0)
    inst = soup.instance[safe_id]
    color = instance_debug_colors(inst)
    # cheap shading cue: modulate by facing (bary-interpolated normal z)
    n = interpolate(vis, soup.normal)
    nz = jnp.abs(n[..., 1:2]) * 0.3 + 0.7
    bg = jnp.asarray(background, jnp.float32)
    return jnp.where(covered[..., None], color * nz, bg)

"""Shadow mapping: depth-only raster into a slot atlas + PCF lookup.

The reference renders a 4x4 atlas of 4096^2 depth slots, one per light, with
direct draws and slope-scaled-bias sampler2DShadow lookups
(/root/reference/src/renderer/systems/shadow_mapping.rs, gltf_mesh.vert:48-58).
Here the atlas is a (n_slots, S, S) depth array written by the same
rasterizer in depth-only mode, and the lookup is a 2x2 PCF gather during
deferred shading.

Casters are culled and expanded PER LIGHT against the light's own frustum
(render_shadow_atlas_per_light), so off-camera geometry still casts into
view — matching the reference, which renders each light's slot from its own
draw set (shadow_mapping.rs:345-491).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderer_tpu.mathx.camera import look_at, orthographic
from renderer_tpu.ops.raster_jax import rasterize
from renderer_tpu.scene.types import Lights


def directional_light_matrices(lights: Lights, scene_min, scene_max) -> jnp.ndarray:
    """(L, 4, 4) light view-proj per light (identity for non-shadow lights).

    Directional lights: orthographic box fitted around the scene AABB,
    looking along the light direction from outside the scene.
    Point lights: a perspective camera at the light position aimed at the
    scene center, fov fitted to the scene's bounding sphere (single-face
    shadow; a full cube-map equivalent = 6 slots, planned).
    """
    from renderer_tpu.mathx.camera import perspective

    center = (scene_min + scene_max) * 0.5
    radius = jnp.linalg.norm(scene_max - scene_min) * 0.5 + 1e-3

    def per_light(position, directional):
        # directional: position is the direction
        d_dir = position / jnp.maximum(jnp.linalg.norm(position), 1e-8)
        eye_dir = center - d_dir * (radius * 2.0)
        to_c = center - position
        dist = jnp.maximum(jnp.linalg.norm(to_c), radius * 0.1 + 1e-3)
        eye = jnp.where(directional, eye_dir, position)
        look_dir = jnp.where(directional, d_dir, to_c / dist)
        up = jnp.where(
            jnp.abs(look_dir[1]) > 0.95,
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        view = look_at(eye, eye + look_dir, up)
        proj_dir = orthographic(radius, radius, radius * 0.5, radius * 3.5)
        fov = 2.0 * jnp.arctan(radius / dist)
        fov = jnp.clip(fov, 0.2, 2.8)
        proj_pt = perspective(fov, 1.0, jnp.maximum(dist - radius, radius * 0.02), dist + radius)
        proj = jnp.where(directional, proj_dir, proj_pt)
        return proj @ view

    mats = jax.vmap(per_light)(lights.position, lights.directional)
    want = lights.alive & (lights.shadow_slot >= 0)
    return jnp.where(want[:, None, None], mats, jnp.eye(4, dtype=jnp.float32))


def render_shadow_atlas_per_light(
    scene,
    light_mats: jnp.ndarray,  # (L, 4, 4)
    lights: Lights,
    model: jnp.ndarray,       # (N, 4, 4) instance model matrices
    lod: jnp.ndarray,         # (N,) i32 per-instance LOD (camera pick)
    n_slots: int,
    slot_size: int,
    caster_capacity: int,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Depth atlas with PER-LIGHT caster culling + expansion.

    Each slot coarse-culls every alive instance against ITS light's frustum
    and expands its own clip-only draw stream, so casters outside the main
    camera still shadow the view (ref: shadow_mapping.rs:345-491 renders
    per-light draw sets; LOD here reuses the camera's per-instance pick
    where the reference picks by light distance). Shadow rasterization is
    two-sided. use_pallas runs the tile kernel per slot (measured at the
    1080p/10k bench, 4x512^2 slots, 64k caster capacity: 2530 -> ~ms-scale
    vs the XLA scan rasterizer)."""
    from renderer_tpu.ops.geometry import coarse_cull, expand_clip_only

    def per_slot(slot):
        match = (lights.shadow_slot == slot) & lights.alive
        li = jnp.argmax(match)
        active = jnp.any(match)
        m = light_mats[li]
        clip_mats = jnp.einsum("ij,njk->nik", m, model, precision="highest")
        visible = coarse_cull(scene, model, m) & active
        clip, valid, count = expand_clip_only(
            scene, visible, lod, clip_mats, caster_capacity
        )
        if use_pallas:
            from renderer_tpu.ops.raster_pallas import rasterize_pallas

            vis = rasterize_pallas(
                clip, valid, slot_size, slot_size,
                cull_backface=False, with_bary=False,
                interpret=pallas_interpret,
            )
        else:
            vis = rasterize(
                clip,
                valid,
                slot_size,
                slot_size,
                strip_rows=min(32, slot_size),
                cull_backface=False,
                count=count,
            )
        return vis.depth

    return jax.lax.map(per_slot, jnp.arange(n_slots, dtype=jnp.int32))


def shadow_occlusion(
    world: jnp.ndarray,      # (3, H, W) channel-first
    ndl: jnp.ndarray,        # (1, H, W) clamped n.l for slope-scaled bias
    light_mat: jnp.ndarray,  # (4, 4)
    slot_depth: jnp.ndarray,  # (S, S)
    normal: jnp.ndarray = None,  # (3, H, W) geometric normal (normal-offset)
    bias: float = 1e-3,
    slope_bias: float = 3e-3,
    normal_offset_texels: float = 1.5,
) -> jnp.ndarray:
    """(1, H, W) shadow factor in [0,1] with 2x2 PCF.

    Acne control: receiver positions are offset along the geometric normal by
    ~1.5 shadow texels ("normal-offset shadows") plus a small slope-scaled
    depth bias — the modern replacement for the reference's purely
    slope-scaled sampler offsets (gltf_mesh.vert:48-58)."""
    s = slot_depth.shape[0]
    if normal is not None:
        # world size of one shadow texel: the light view rows are orthonormal
        # scaled by the ortho projection, so ||row0[:3]|| = 1/half_w
        row_norm = jnp.linalg.norm(light_mat[0, :3]) + 1e-12
        texel_world = 2.0 / (row_norm * s)
        world = world + normal * (texel_world * normal_offset_texels)
    hcf = jnp.concatenate([world, jnp.ones((1,) + world.shape[1:], jnp.float32)], axis=0)
    clip = jnp.einsum("ij,jhw->ihw", light_mat, hcf, precision="highest")
    w = jnp.where(jnp.abs(clip[3]) > 1e-9, clip[3], 1e-9)
    u = (clip[0] / w + 1.0) * 0.5
    v = (1.0 - clip[1] / w) * 0.5
    d = clip[2] / w
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (d >= 0) & (d <= 1)

    slope = jnp.sqrt(jnp.maximum(1.0 - ndl[0] ** 2, 0.0)) / jnp.maximum(ndl[0], 1e-2)
    ref_d = d - (bias + slope_bias * jnp.minimum(slope, 4.0))

    tx = u * s - 0.5
    ty = v * s - 0.5
    x0 = jnp.floor(tx).astype(jnp.int32)
    y0 = jnp.floor(ty).astype(jnp.int32)
    fx = tx - x0
    fy = ty - y0

    def tap(xo, yo):
        xi = jnp.clip(x0 + xo, 0, s - 1)
        yi = jnp.clip(y0 + yo, 0, s - 1)
        sample = slot_depth[yi, xi]
        return (ref_d <= sample).astype(jnp.float32)

    lit = (
        tap(0, 0) * (1 - fx) * (1 - fy)
        + tap(1, 0) * fx * (1 - fy)
        + tap(0, 1) * (1 - fx) * fy
        + tap(1, 1) * fx * fy
    )
    return jnp.where(inside, lit, 1.0)[None]  # (1, H, W)

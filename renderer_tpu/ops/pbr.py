"""PBR metallic-roughness deferred shading (GGX + Smith + Schlick).

The TPU re-expression of the reference's forward fragment shader
gltf_mesh.frag (TBN normal mapping frag/vert:46-71, GGX specular
frag:90-134, two lights, shadow lookup) as whole-framebuffer array math.
Shadow terms plug in via an occlusion image computed by the shadow passes
(ops/shadow.py); `occlusion=None` means fully lit.
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_tpu.ops.geometry import TriangleSoup
from renderer_tpu.ops.raster_jax import VisibilityBuffer, interpolate
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.ops.texture import sample_atlas, srgb_to_linear
from renderer_tpu.scene.types import Scene


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def _ggx_brdf(n, v, l, albedo, metallic, roughness):
    """Cook-Torrance specular + Lambert diffuse. All (..., 3) / (..., 1)."""
    h = _normalize(v + l)
    ndl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1, keepdims=True), 1e-4)
    ndh = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    vdh = jnp.maximum(jnp.sum(v * h, axis=-1, keepdims=True), 0.0)

    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    # GGX normal distribution
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(jnp.pi * denom * denom, 1e-9)
    # Smith height-correlated visibility (Heitz approximation)
    gv = ndl * jnp.sqrt(ndv * ndv * (1 - a2) + a2)
    gl = ndv * jnp.sqrt(ndl * ndl * (1 - a2) + a2)
    vis = 0.5 / jnp.maximum(gv + gl, 1e-9)
    # Schlick Fresnel
    f0 = 0.04 * (1.0 - metallic) + albedo * metallic
    f = f0 + (1.0 - f0) * (1.0 - vdh) ** 5

    specular = d * vis * f
    diffuse = albedo * (1.0 - metallic) * (1.0 - f) / jnp.pi
    return (diffuse + specular) * ndl


def shade_pbr(
    vis: VisibilityBuffer,
    soup: TriangleSoup,
    scene: Scene,
    camera_pos: jnp.ndarray,
    viewproj_inv: jnp.ndarray = None,
    shadow=None,  # optional (shadow_depth (n_slots,S,S), light_mats (L,4,4))
    background=(0.05, 0.05, 0.08),
    ambient: float = 0.03,
    y0=0,
    full_height: int = None,
) -> jnp.ndarray:
    from renderer_tpu.ops.geometry import unproject_depth

    covered = vis.tri_id != NO_TRIANGLE
    safe_id = jnp.maximum(vis.tri_id, 0)

    h_, w_ = vis.depth.shape
    world = unproject_depth(
        vis.depth, viewproj_inv, w_, h_, y0=y0, full_height=full_height
    )
    uv = interpolate(vis, soup.uv)
    n_geom = _normalize(interpolate(vis, soup.normal))
    tangent4 = interpolate(vis, soup.tangent)
    tex_lod = soup.tex_lod[safe_id]  # (H, W)

    inst = soup.instance[safe_id]
    mat_id = scene.instances.material_id[inst]
    mats = scene.materials
    base_factor = mats.base_color_factor[mat_id]  # (H, W, 4)
    metallic = mats.metallic[mat_id][..., None]
    roughness = mats.roughness[mat_id][..., None]
    emissive = mats.emissive[mat_id]
    bc_layer = mats.base_color_tex[mat_id]
    nm_layer = mats.normal_tex[mat_id]

    bc_tex = sample_atlas(scene.atlas, bc_layer, uv, tex_lod)
    albedo = base_factor[..., :3] * srgb_to_linear(bc_tex[..., :3])

    # normal mapping: TBN from interpolated tangent frame (frag's TBN path)
    t = tangent4[..., :3]
    t = _normalize(t - n_geom * jnp.sum(t * n_geom, axis=-1, keepdims=True))
    b = jnp.cross(n_geom, t) * tangent4[..., 3:4]
    nm = sample_atlas(scene.atlas, nm_layer, uv, tex_lod)
    nm_vec = nm[..., :3] * 2.0 - 1.0
    n_mapped = _normalize(
        t * nm_vec[..., 0:1] + b * nm_vec[..., 1:2] + n_geom * nm_vec[..., 2:3]
    )
    n = jnp.where((nm_layer >= 0)[..., None], n_mapped, n_geom)

    v = _normalize(camera_pos - world)
    lights = scene.lights
    color = albedo * ambient + emissive
    for li in range(lights.alive.shape[0]):
        on = lights.alive[li]
        to_light = jnp.where(
            lights.directional[li], -lights.position[li], lights.position[li] - world
        )
        dist2 = jnp.sum(to_light * to_light, axis=-1, keepdims=True)
        l = to_light / jnp.sqrt(jnp.maximum(dist2, 1e-12))
        atten = jnp.where(lights.directional[li], 1.0, 1.0 / jnp.maximum(dist2, 1e-4))
        radiance = lights.color[li] * (lights.intensity[li] * atten)
        if shadow is not None:
            from renderer_tpu.ops.shadow import shadow_occlusion

            shadow_depth, light_mats = shadow
            slot = lights.shadow_slot[li]
            casts = (slot >= 0) & lights.directional[li] & on
            ndl_geom = jnp.maximum(
                jnp.sum(n_geom * l, axis=-1, keepdims=True), 0.0
            )
            occl = shadow_occlusion(
                world, ndl_geom, light_mats[li],
                shadow_depth[jnp.maximum(slot, 0)],
                normal=n_geom,
            )
            radiance = radiance * jnp.where(casts, occl, 1.0)
        contrib = _ggx_brdf(n, v, l, albedo, metallic, roughness) * radiance
        color = color + jnp.where(on, contrib, 0.0)

    bg = jnp.asarray(background, jnp.float32)
    return jnp.where(covered[..., None], color, bg)

"""Texture sampling from the packed mip atlas.

The fragment-shader `texture(sampler2D...)` of the reference
(gltf_mesh.frag's bindless base_color[]/normal_map[] lookups) becomes batched
gather arithmetic over the packed pyramid: per pixel (layer, uv, lod) ->
bilinear (4 gathers) per mip level, trilinear = lerp of two levels
(8 gathers). Wrap mode: repeat (the glTF default).
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_tpu.scene.textures import TextureAtlas


def _gather_texels(atlas: TextureAtlas, level, layer, x, y):
    """Integer texel fetch. level/layer/x/y: broadcastable i32 arrays.
    x, y must already be wrapped to [0, size_l)."""
    size = atlas.level_size[level]
    off = atlas.level_offset[level]
    idx = off + (layer * size + y) * size + x
    return atlas.packed[idx].astype(jnp.float32) / 255.0  # (..., 4)


def _bilinear(atlas: TextureAtlas, level, layer, uv):
    """uv in [0,1)^2 (repeat-wrapped), level (...,) i32, layer (...,) i32."""
    size = atlas.level_size[level]
    fs = size.astype(jnp.float32)
    tx = uv[..., 0] * fs - 0.5
    ty = uv[..., 1] * fs - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = (tx - x0)[..., None]
    fy = (ty - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    # repeat wrap (size is a power of two: mask with size-1)
    m = size - 1
    x0w, x1w = x0 & m, (x0 + 1) & m
    y0w, y1w = y0 & m, (y0 + 1) & m
    t00 = _gather_texels(atlas, level, layer, x0w, y0w)
    t10 = _gather_texels(atlas, level, layer, x1w, y0w)
    t01 = _gather_texels(atlas, level, layer, x0w, y1w)
    t11 = _gather_texels(atlas, level, layer, x1w, y1w)
    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )


def sample_atlas(
    atlas: TextureAtlas,
    layer: jnp.ndarray,  # (...,) i32
    uv: jnp.ndarray,  # (..., 2) f32
    lod: jnp.ndarray = None,  # (...,) f32 or None for sharp mip 0
    trilinear: bool = True,
) -> jnp.ndarray:
    """Sample RGBA in [0,1]. layer < 0 returns white (no-texture default,
    mirroring the reference's robustness2 null-descriptor reads returning
    defined values)."""
    n_levels = atlas.num_levels
    safe_layer = jnp.maximum(layer, 0)
    uvf = uv - jnp.floor(uv)  # repeat wrap to [0,1)
    if lod is None:
        out = _bilinear(atlas, jnp.zeros_like(safe_layer), safe_layer, uvf)
    else:
        lod = jnp.clip(lod, 0.0, n_levels - 1.0)
        l0 = jnp.floor(lod).astype(jnp.int32)
        if trilinear:
            l1 = jnp.minimum(l0 + 1, n_levels - 1)
            f = (lod - l0.astype(jnp.float32))[..., None]
            s0 = _bilinear(atlas, l0, safe_layer, uvf)
            s1 = _bilinear(atlas, l1, safe_layer, uvf)
            out = s0 * (1 - f) + s1 * f
        else:
            out = _bilinear(atlas, l0, safe_layer, uvf)
    return jnp.where((layer >= 0)[..., None], out, 1.0)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """glTF base-color textures are sRGB-encoded."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)

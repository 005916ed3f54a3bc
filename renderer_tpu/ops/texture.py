"""Texture sampling from the packed mip atlas — CHANNEL-FIRST.

The fragment-shader `texture(sampler2D...)` of the reference
(gltf_mesh.frag's bindless base_color[]/normal_map[] lookups) becomes batched
gather arithmetic over the packed pyramid. Each bilinear tap is ONE gather of
a uint32 RGBA word (channels unpacked with bit math), and every intermediate
is a well-tiled 2D (H, W) plane — trailing small axes would be padded 10-40x
by the TPU's (8, 128) tiling. Wrap mode: repeat (the glTF default).
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_tpu.scene.textures import TextureAtlas


def _fetch_rgba(atlas: TextureAtlas, level, layer, x, y):
    """Integer texel fetch -> (4, ...) f32 in [0,1]. x, y pre-wrapped."""
    size = atlas.level_size[level]
    off = atlas.level_offset[level]
    idx = off + (layer * size + y) * size + x
    word = atlas.packed_u32[idx]
    return jnp.stack(
        [
            (word & 0xFF).astype(jnp.float32),
            ((word >> 8) & 0xFF).astype(jnp.float32),
            ((word >> 16) & 0xFF).astype(jnp.float32),
            ((word >> 24) & 0xFF).astype(jnp.float32),
        ],
        axis=0,
    ) * (1.0 / 255.0)


def _bilinear(atlas: TextureAtlas, level, layer, u, v):
    """level/layer/u/v: (...,) arrays; u, v in [0,1). Returns (4, ...)."""
    size = atlas.level_size[level]
    fs = size.astype(jnp.float32)
    tx = u * fs - 0.5
    ty = v * fs - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    m = size - 1  # power-of-two repeat wrap
    t00 = _fetch_rgba(atlas, level, layer, x0 & m, y0 & m)
    t10 = _fetch_rgba(atlas, level, layer, (x0 + 1) & m, y0 & m)
    t01 = _fetch_rgba(atlas, level, layer, x0 & m, (y0 + 1) & m)
    t11 = _fetch_rgba(atlas, level, layer, (x0 + 1) & m, (y0 + 1) & m)
    return (
        t00 * ((1 - fx) * (1 - fy))[None]
        + t10 * (fx * (1 - fy))[None]
        + t01 * ((1 - fx) * fy)[None]
        + t11 * (fx * fy)[None]
    )


def sample_atlas_cf(
    atlas: TextureAtlas,
    layer: jnp.ndarray,  # (...,) i32
    u: jnp.ndarray,  # (...,) f32
    v: jnp.ndarray,  # (...,) f32
    lod: jnp.ndarray = None,  # (...,) f32 or None for sharp mip 0
    trilinear: bool = True,
) -> jnp.ndarray:
    """Channel-first RGBA sample -> (4, ...). layer < 0 returns white (the
    null-descriptor default, mirroring the reference's robustness2 reads)."""
    n_levels = atlas.num_levels
    safe_layer = jnp.maximum(layer, 0)
    uf = u - jnp.floor(u)
    vf = v - jnp.floor(v)
    if lod is None:
        out = _bilinear(atlas, jnp.zeros_like(safe_layer), safe_layer, uf, vf)
    else:
        lod = jnp.clip(lod, 0.0, n_levels - 1.0)
        l0 = jnp.floor(lod).astype(jnp.int32)
        if trilinear:
            l1 = jnp.minimum(l0 + 1, n_levels - 1)
            f = (lod - l0.astype(jnp.float32))[None]
            s0 = _bilinear(atlas, l0, safe_layer, uf, vf)
            s1 = _bilinear(atlas, l1, safe_layer, uf, vf)
            out = s0 * (1 - f) + s1 * f
        else:
            out = _bilinear(atlas, l0, safe_layer, uf, vf)
    return jnp.where((layer >= 0)[None], out, 1.0)


def sample_atlas(
    atlas: TextureAtlas,
    layer: jnp.ndarray,  # (...,) i32
    uv: jnp.ndarray,  # (..., 2) f32
    lod: jnp.ndarray = None,
    trilinear: bool = True,
) -> jnp.ndarray:
    """Channel-last convenience wrapper -> (..., 4). Prefer sample_atlas_cf in
    hot paths (channel-first avoids tiled-layout padding)."""
    out = sample_atlas_cf(atlas, layer, uv[..., 0], uv[..., 1], lod, trilinear)
    return jnp.moveaxis(out, 0, -1)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """glTF base-color textures are sRGB-encoded."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)

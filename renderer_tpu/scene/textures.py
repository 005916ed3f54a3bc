"""Texture atlas: the bindless-texture analogue.

The reference binds 2x3072 partially-bound descriptor arrays indexed by draw
id (renderer.rs:243-248, systems/textures.rs). On TPU, descriptors don't
exist; all textures live in one packed mip-pyramid array in HBM and samplers
gather from it with a per-pixel (layer, uv, lod) — one flat address space,
which is exactly what "bindless" was approximating.

Layout: every texture is resampled to a fixed layer size S (power of two).
Mip level l holds all L layers at size s_l = S >> l, packed level-major into
one (total_texels, 4) uint8 array:

    texel(l, layer, y, x) = packed[off_l + (layer * s_l + y) * s_l + x]

so per-pixel mip selection is pure index arithmetic — no per-level branching.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class TextureAtlas(NamedTuple):
    """Device-side atlas pytree. Static geometry is recoverable from shapes:
    n_layers = offsets/sizes are aux arrays.

    packed_u32 holds RGBA packed into one uint32 per texel so a bilinear tap
    is ONE gather (channel unpack is bit math on well-tiled 2D planes)."""

    packed: "np.ndarray"   # (total_texels, 4) uint8
    packed_u32: "np.ndarray"  # (total_texels,) uint32, R | G<<8 | B<<16 | A<<24
    level_offset: "np.ndarray"  # (n_levels,) int32, texel offsets
    level_size: "np.ndarray"    # (n_levels,) int32, s_l
    n_layers: "np.ndarray"      # () int32

    @property
    def num_levels(self) -> int:
        return self.level_size.shape[0]


def _box_downsample(img: np.ndarray) -> np.ndarray:
    """(h, w, 4) u8 -> (h/2, w/2, 4) u8 box filter in float."""
    h, w, c = img.shape
    f = img.astype(np.float32).reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def build_mips(img: np.ndarray, min_size: int = 1) -> list:
    """Full mip chain from (S, S, 4) u8."""
    mips = [img]
    while mips[-1].shape[0] > min_size:
        mips.append(_box_downsample(mips[-1]))
    return mips


class TextureAtlasBuilder:
    """Host-side accumulator; resizes inputs to (size, size, RGBA u8)."""

    def __init__(self, size: int = 256, max_layers: int = 64):
        assert size & (size - 1) == 0, "atlas layer size must be a power of two"
        self.size = size
        self.max_layers = max_layers
        self.layers: list[np.ndarray] = []

    def add(self, img: np.ndarray) -> int:
        """Add an (h, w, 3|4) uint8/float image; returns layer index."""
        if len(self.layers) >= self.max_layers:
            raise ValueError("texture atlas full")
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1
            )
        if img.shape[:2] != (self.size, self.size):
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((self.size, self.size), Image.BILINEAR)
            )
        self.layers.append(img)
        return len(self.layers) - 1

    def build(self, preallocate: int = None) -> TextureAtlas:
        """preallocate=N reserves N layer slots (white) so textures can be
        streamed in at runtime (runtime/streaming.py request_texture)."""
        import jax.numpy as jnp

        layers = list(self.layers) or [np.full((self.size, self.size, 4), 255, np.uint8)]
        n_real = len(self.layers)  # committed layers (placeholders excluded)
        if preallocate is not None:
            while len(layers) < preallocate:
                layers.append(np.full((self.size, self.size, 4), 255, np.uint8))
        n = len(layers)
        chains = [build_mips(img) for img in layers]
        n_levels = len(chains[0])
        packed_parts = []
        offsets = []
        sizes = []
        off = 0
        for l in range(n_levels):
            s = self.size >> l
            offsets.append(off)
            sizes.append(s)
            level = np.stack([c[l] for c in chains])  # (n, s, s, 4)
            packed_parts.append(level.reshape(-1, 4))
            off += n * s * s
        packed = np.concatenate(packed_parts, axis=0)
        p32 = (
            packed[:, 0].astype(np.uint32)
            | (packed[:, 1].astype(np.uint32) << 8)
            | (packed[:, 2].astype(np.uint32) << 16)
            | (packed[:, 3].astype(np.uint32) << 24)
        )
        return TextureAtlas(
            packed=jnp.asarray(packed),
            packed_u32=jnp.asarray(p32),
            level_offset=jnp.asarray(np.asarray(offsets, np.int32)),
            level_size=jnp.asarray(np.asarray(sizes, np.int32)),
            n_layers=jnp.asarray(np.int32(n_real)),
        )


def empty_atlas(size: int = 4) -> TextureAtlas:
    return TextureAtlasBuilder(size=size).build()

"""Draw-stream compaction: densify surviving triangles to the soup's front.

The reference compacts its indirect-draw stream on the GPU with subgroup
ballots + atomics (compact_draw_stream.comp; generate_work.comp's atomic
index append). The TPU-native equivalent is a masked stable compaction via
prefix sum + scatter-with-drop: one fused XLA op sequence, no atomics.

After compaction, `count` bounds the live prefix, so the rasterizer's
triangle loop runs ceil(count / block) iterations instead of the full
capacity — work scales with *visible* geometry, the reference's headline
property (SURVEY.md §5 long-context analogue).
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_tpu.ops.geometry import TriangleSoup


def compact_soup(soup: TriangleSoup) -> TriangleSoup:
    """Stable-compact valid triangles to the front; returns same-capacity
    soup with a tight count. Invalid tail slots are zeroed (degenerate)."""
    valid = soup.valid
    capacity = valid.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1  # target slot per valid entry
    count = jnp.where(capacity > 0, pos[-1] + 1, 0).astype(jnp.int32)
    dest = jnp.where(valid, pos, capacity)  # invalid -> out of bounds

    def scatter(x):
        if x.ndim == 0:
            return x
        out = jnp.zeros_like(x)
        return out.at[dest].set(x, mode="drop")

    new_valid = jnp.arange(capacity, dtype=jnp.int32) < count
    fields = {
        name: scatter(getattr(soup, name))
        for name in soup._fields
        if name not in ("valid", "count")
    }
    return TriangleSoup(valid=new_valid, count=count, **fields)

"""Compaction + cull-stage tests (the compact_draw_stream analogue)."""

import numpy as np
import jax
import jax.numpy as jnp

from renderer_tpu.ops.cull import compact_soup
from renderer_tpu.ops.geometry import TriangleSoup
from renderer_tpu.passes.pipeline import empty_soup


def make_soup(capacity, valid_mask, rng):
    s = empty_soup(capacity)
    return s._replace(
        clip=jnp.asarray(rng.normal(size=(capacity, 3, 4)), jnp.float32),
        instance=jnp.arange(capacity, dtype=jnp.int32),
        valid=jnp.asarray(valid_mask),
        count=jnp.int32(capacity),
    )


def test_compact_stable_and_tight():
    rng = np.random.default_rng(0)
    cap = 64
    mask = rng.random(cap) < 0.4
    soup = make_soup(cap, mask, rng)
    out = compact_soup(soup)
    n = int(mask.sum())
    assert int(out.count) == n
    # stable: surviving instances keep relative order
    np.testing.assert_array_equal(
        np.asarray(out.instance[:n]), np.where(mask)[0].astype(np.int32)
    )
    # clip data moved with them
    np.testing.assert_array_equal(
        np.asarray(out.clip[:n]), np.asarray(soup.clip)[mask]
    )
    # valid prefix exactly
    np.testing.assert_array_equal(np.asarray(out.valid), np.arange(cap) < n)


def test_compact_all_and_none():
    rng = np.random.default_rng(1)
    soup = make_soup(32, np.ones(32, bool), rng)
    out = compact_soup(soup)
    assert int(out.count) == 32
    np.testing.assert_array_equal(np.asarray(out.clip), np.asarray(soup.clip))

    soup0 = make_soup(32, np.zeros(32, bool), rng)
    out0 = compact_soup(soup0)
    assert int(out0.count) == 0
    assert not np.asarray(out0.valid).any()


def test_compact_under_jit_and_raster_count():
    """Compaction + count-bounded raster give identical images to unbounded."""
    from renderer_tpu.ops.raster_jax import rasterize

    rng = np.random.default_rng(2)
    cap = 256
    # a few real triangles among garbage
    clip = np.zeros((cap, 3, 4), np.float32)
    mask = np.zeros(cap, bool)
    for k, x in enumerate(np.linspace(-0.5, 0.5, 5)):
        i = int(rng.integers(0, cap))
        mask[i] = True
        clip[i] = [[-0.3 + x, -0.3, 0.5, 1], [0.3 + x, -0.3, 0.5, 1], [x, 0.4, 0.5, 1]]
    soup = make_soup(cap, mask, rng)._replace(clip=jnp.asarray(clip))
    out = jax.jit(compact_soup)(soup)
    vis_bounded = rasterize(out.clip, out.valid, 64, 64, count=out.count)
    vis_full = rasterize(out.clip, out.valid, 64, 64)
    np.testing.assert_array_equal(np.asarray(vis_bounded.tri_id), np.asarray(vis_full.tri_id))
    np.testing.assert_array_equal(np.asarray(vis_bounded.depth), np.asarray(vis_full.depth))

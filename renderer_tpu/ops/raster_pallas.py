"""Pallas tile rasterizer — the hot kernel (ops/raster_spec.py semantics).

Replaces the fixed-function rasterizer + early-z the reference gets from the
GPU hardware (and its per-triangle cull kernel generate_work.comp) with a
TPU-native design:

- The framebuffer is processed in (TILE_H x TILE_W) = (32 x 128) pixel tiles,
  one Pallas grid cell each — depth/id/bary accumulators live in VMEM for the
  whole tile (no HBM read-modify-write per triangle, the software analogue of
  tiled ROPs).
- Triangle setup (oriented edge matrices, z/w, screen bboxes) is precomputed
  by XLA as a transposed SoA matrix `tri_data` (ROWS, T) so each kernel DMA
  pulls a (ROWS, BLOCK) stripe — contiguous, 128-lane aligned.
- Block-level binning: triangles arrive in blocks of BLOCK; per tile, a
  host/XLA-precomputed list of overlapping blocks (by bbox union) is walked
  with double-buffered DMAs, so HBM traffic and compute scale with
  coverage, not scene size. (True per-triangle binning lands on top of this;
  compacted soups are spatially coherent per mesh, so block bboxes are tight.)
- Inside a block, 8-triangle sublane groups are sliced from the VMEM record
  buffer and each triangle's fields read with STATIC indices (Mosaic forbids
  dynamic lane indexing); per triangle: 3 edge-function FMAs on the pixel
  tile, top-left fill rule, perspective z, depth-test select.
- Row shards: y0/full_height render a horizontal slice of a larger
  framebuffer for multi-chip split-frame rendering (renderer_tpu.parallel).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderer_tpu.ops.raster_jax import VisibilityBuffer
from renderer_tpu.ops.raster_spec import DEPTH_CLEAR, FRONT_DET_SIGN, NO_TRIANGLE

# tuning override for A/B scripts only (scripts/prof_raster*.py)
TILE_H = int(__import__("os").environ.get("RT_TILE_H", "32"))
TILE_W = 128
# Triangles per bin/DMA unit. The kernel is jointly DMA-latency and
# scalar-loop bound: measured on v5e at the 1080p bench, BLOCK 8/16/32/64/128
# -> 76/41/33/31/33 ms — larger DMA units win even though block bboxes
# loosen (the per-triangle scalar bbox reject absorbs the waste).
BLOCK = 64
# f32 record columns per triangle: 23 used, padded to 32 so four records
# tile one physical 128-lane row — the (T, 32) table is stored reshaped as
# (T//4, 128), Mosaic DMAs stay 128-lane aligned, and each 64-triangle
# block DMA moves 8 KB instead of the full-row layout's 32 KB
ROWS = 32
_R_E = 0      # cols 0..8: oriented edge coeffs (e0a,e0b,e0c, e1a,..., e2c)
_R_Z = 9      # cols 9..11: z_clip per vertex
_R_W = 12     # cols 12..14: w_clip per vertex
_R_BB = 15    # cols 15..18: bbox (xmin, xmax, ymin, ymax) in pixel coords
_R_OK = 19    # col 19: 1.0 if triangle participates
# cols 20..22: per-edge fill-rule thresholds. The top-left rule
# "lam > 0 or (lam == 0 and top_left)" costs 4 vector ops per edge; with TPU
# flush-to-zero, lam is never a subnormal, so it is EXACTLY "lam > te" with
# te = -FLT_MIN for top-left edges and 0 otherwise — one vector compare.
_R_TE = 20
_FLT_MIN = 1.1754943508222875e-38  # smallest normal f32


def _setup_tri_data(clip, valid, width, height, cull_backface):
    """Triangle setup -> (tri_data (T, ROWS), block meta) — COLUMN MATH.

    The earlier (T, 3, 3)-tile formulation was pure layout cost (~6 ms/frame
    at T=131k on v5e): adjugate/bbox on lane-padded tiles, a stack(axis=-1)
    relayout, and a 23-lane concat. Here a single transposing identity dot
    (geometry._t_cols) turns clip into (12, T) contiguous rows, every
    quantity is an (T,) column FMA, and the record block is rebuilt with
    stack-as-rows + one MXU transpose (geometry._rows_from_cols pattern).
    Same expressions as before, term by term."""
    from renderer_tpu.ops.geometry import _t_cols

    t_cap = clip.shape[0]
    ct = _t_cols(clip.reshape(t_cap, 12))  # (12, T): [c0 xyzw, c1, c2]
    x = [ct[4 * c] for c in range(3)]
    y = [ct[4 * c + 1] for c in range(3)]
    zs = [ct[4 * c + 2] for c in range(3)]
    ws = [ct[4 * c + 3] for c in range(3)]
    # pixel-homogeneous corners (ops/raster_spec.py): same expressions as
    # pixel_homogeneous()
    ux = [(x[c] + ws[c]) * (0.5 * width) for c in range(3)]
    uy = [(ws[c] - y[c]) * (0.5 * height) for c in range(3)]
    uz = ws

    def cross(a_i, b_i):
        """adjugate row = cross of the other two pixel-homogeneous corners
        (identical products to geometry.adjugate3)."""
        return (
            uy[a_i] * uz[b_i] - uz[a_i] * uy[b_i],
            uz[a_i] * ux[b_i] - ux[a_i] * uz[b_i],
            ux[a_i] * uy[b_i] - uy[a_i] * ux[b_i],
        )

    adj_rows = [cross(1, 2), cross(2, 0), cross(0, 1)]  # e0, e1, e2
    det = (
        ux[0] * (uy[1] * uz[2] - uy[2] * uz[1])
        - ux[1] * (uy[0] * uz[2] - uy[2] * uz[0])
        + ux[2] * (uy[0] * uz[1] - uy[1] * uz[0])
    )
    if cull_backface:
        sgn = jnp.float32(FRONT_DET_SIGN)
        ok = valid & (det * FRONT_DET_SIGN > 0)
    else:
        sgn = jnp.sign(det)
        ok = valid & (det != 0)
    adj_rows = [tuple(comp * sgn for comp in row) for row in adj_rows]

    all_front = (ws[0] > 1e-9) & (ws[1] > 1e-9) & (ws[2] > 1e-9)
    safe_w = [jnp.where(jnp.abs(w) > 1e-9, w, 1e-9) for w in ws]
    px = [ux[c] / safe_w[c] for c in range(3)]
    py = [uy[c] / safe_w[c] for c in range(3)]

    def min3(v):
        return jnp.minimum(jnp.minimum(v[0], v[1]), v[2])

    def max3(v):
        return jnp.maximum(jnp.maximum(v[0], v[1]), v[2])

    xmin = jnp.where(all_front, min3(px) - 0.5, 0.0)
    xmax = jnp.where(all_front, max3(px) + 0.5, float(width))
    ymin = jnp.where(all_front, min3(py) - 0.5, 0.0)
    ymax = jnp.where(all_front, max3(py) + 0.5, float(height))
    # clip the bbox so off-screen tris never flag any tile
    on_screen = (xmax >= 0) & (xmin <= width) & (ymax >= 0) & (ymin <= height)
    ok = ok & on_screen

    # per-edge fill-rule thresholds (see _R_TE): top-left edges accept
    # lam == 0, encoded as a strict compare against -FLT_MIN (exact under
    # the TPU's flush-to-zero arithmetic)
    te = [
        jnp.where(
            (row[0] > 0) | ((row[0] == 0) & (row[1] > 0)),
            jnp.float32(-_FLT_MIN),
            jnp.float32(0.0),
        )
        for row in adj_rows
    ]

    # record layout _R_*: stack columns as contiguous rows, pad to ROWS, one
    # MXU transpose to the (T, ROWS) row-major block the kernel DMAs
    # dead triangles get a poisoned bbox in the RECORD (the kernel's bbox
    # test then rejects them with no separate _R_OK scalar load); the raw
    # bbox + ok go to the binner, which masks identically
    inf = jnp.float32(jnp.inf)
    cols = (
        [comp for row in adj_rows for comp in row]  # 0..8  e0abc,e1abc,e2abc
        + list(zs)  # 9..11
        + list(ws)  # 12..14
        + [
            jnp.where(ok, xmin, inf),  # 15..18
            jnp.where(ok, xmax, -inf),
            jnp.where(ok, ymin, inf),
            jnp.where(ok, ymax, -inf),
        ]
        + [ok.astype(jnp.float32)]  # 19
        + te  # 20..22
    )
    stacked = jnp.concatenate(
        [
            jnp.stack(cols, axis=0),
            jnp.zeros((ROWS - len(cols), t_cap), jnp.float32),
        ],
        axis=0,
    )  # (ROWS, T), contiguous row writes
    eye = jnp.eye(ROWS, dtype=jnp.float32)
    tri_data = jax.lax.dot_general(
        stacked, eye, (((0,), (0,)), ((), ())), precision="highest"
    ).reshape(t_cap * ROWS // 128, 128)  # (T, ROWS) -> 128-lane DMA rows
    # "simple" triangles can skip the per-pixel w>0 and z-range tests:
    # all corners front (w > 1e-9) and z in [0, w] corner-wise implies the
    # interpolated z_num in [0, w_i] (non-negative barycentric combination)
    # and w_i > 0 for any covered pixel (sum of lams = det > 0 after the
    # orientation flip, so not all lams vanish on a non-degenerate
    # triangle). The kernel picks a cheaper inner loop for blocks whose
    # live triangles are all simple (~25% fewer vector ops per hit).
    z_in = (
        (zs[0] >= 0) & (zs[1] >= 0) & (zs[2] >= 0)
        & (zs[0] <= ws[0]) & (zs[1] <= ws[1]) & (zs[2] <= ws[2])
    )
    simple = ok & all_front & z_in
    return tri_data, (xmin, xmax, ymin, ymax, ok), simple


MAX_BLOCKS_PER_TILE = 2048  # per-tile bin list cap (SMEM scratch = 8 KB)


def _bin_blocks(bbox_ok, t_cap, width, height, y0=0, tile_bboxes=None):
    """Block-granularity binning: per tile, the ascending list of triangle
    blocks whose bbox union overlaps the tile (padded, with counts).

    Lists live in HBM (n_tiles x MAXB, 128-aligned rows) and are DMA'd into
    SMEM per tile; a tile overlapping more than MAXB blocks gets the
    sentinel count -1 = "walk every block" (correct, just unbinned).

    tile_bboxes: optional (t_x0, t_x1, t_y0, t_y1) arrays of shape
    (n_ty, n_tx) replacing the regular pixel-grid tile extents — used by the
    light-space occlusion kernel, where each SCREEN tile covers a
    data-dependent LIGHT-space bbox."""
    xmin, xmax, ymin, ymax, ok = bbox_ok
    n_blocks = t_cap // BLOCK
    inf = jnp.float32(jnp.inf)
    bxmin = jnp.min(jnp.where(ok, xmin, inf).reshape(n_blocks, BLOCK), axis=1)
    bxmax = jnp.max(jnp.where(ok, xmax, -inf).reshape(n_blocks, BLOCK), axis=1)
    bymin = jnp.min(jnp.where(ok, ymin, inf).reshape(n_blocks, BLOCK), axis=1)
    bymax = jnp.max(jnp.where(ok, ymax, -inf).reshape(n_blocks, BLOCK), axis=1)
    bany = jnp.any(ok.reshape(n_blocks, BLOCK), axis=1)

    n_ty = height // TILE_H
    n_tx = width // TILE_W
    if tile_bboxes is None:
        ty = jnp.arange(n_ty, dtype=jnp.float32)[:, None, None]
        tx = jnp.arange(n_tx, dtype=jnp.float32)[None, :, None]
        t_x0, t_x1 = tx * TILE_W, (tx + 1) * TILE_W
        y0f = jnp.asarray(y0, jnp.float32)
        t_y0, t_y1 = y0f + ty * TILE_H, y0f + (ty + 1) * TILE_H
    else:
        t_x0, t_x1, t_y0, t_y1 = (b[..., None] for b in tile_bboxes)
    overlap = (
        bany[None, None, :]
        & (bxmin[None, None, :] <= t_x1)
        & (bxmax[None, None, :] >= t_x0)
        & (bymin[None, None, :] <= t_y1)
        & (bymax[None, None, :] >= t_y0)
    )  # (n_ty, n_tx, n_blocks)
    # compact each tile's overlapping block ids to the front. A stable
    # argsort on the negated overlap bit puts overlapping ids (ascending)
    # first — one fused sort. The previous cumsum + vmapped scatter was
    # measured at 4.8 ms/frame at the 1080p bench (scatters are
    # index-rate bound like gathers: n_tiles * n_blocks = 1M destinations);
    # the sort is ~8x cheaper.
    # 1024-entry (8 SMEM-row) quantum, like _bin_blocks_from_masks
    maxb = min(_round_up(max(n_blocks, 1), 1024), MAX_BLOCKS_PER_TILE)
    n_ty_, n_tx_, _ = overlap.shape
    flat = overlap.reshape(n_ty_ * n_tx_, n_blocks)
    block_count = jnp.sum(flat, axis=1, dtype=jnp.int32)
    block_list = jnp.argsort(
        ~flat, axis=1, stable=True
    )[:, :maxb].astype(jnp.int32)
    if block_list.shape[1] < maxb:  # small scenes: n_blocks < 128-row quantum
        block_list = jnp.pad(
            block_list, ((0, 0), (0, maxb - block_list.shape[1]))
        )
    block_count = jnp.where(block_count > maxb, -1, block_count)
    return (
        block_list.reshape(n_ty_, n_tx_, maxb),
        block_count.reshape(n_ty_, n_tx_),
    )


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bin_blocks_from_masks(masks, n_blocks):
    """Per-tile block lists derived from the per-triangle bit masks.

    A block belongs in a tile's list iff ANY of its triangles' bbox
    tile-intervals contain the tile — i.e. its 64-bit mask is nonzero. This
    is strictly tighter than _bin_blocks's bbox-UNION overlap (a block's
    union bbox can overlap a tile no individual triangle touches: such
    visits used to DMA the records and occupy list slots just to skip on
    the empty mask), and it drops the separate per-block min/max bbox
    reduction + overlap compare entirely — the masks already exist for the
    kernel's per-triangle bit test."""
    n_tiles = masks.shape[0]
    w0 = masks[:, 0 : 2 * n_blocks : 2]  # (n_tiles, n_blocks)
    w1 = masks[:, 1 : 2 * n_blocks : 2]
    flat = (w0 | w1) != 0
    # 1024-entry (8 SMEM-row) quantum: HBM->SMEM DMA blocks need sublane
    # counts <= 8 or multiples of 8 — 10- and 12-row lists (capacities
    # 81920/98304) faulted the TPU worker (PERF.md r5 session 8 bisect)
    maxb = min(_round_up(max(n_blocks, 1), 1024), MAX_BLOCKS_PER_TILE)
    block_count = jnp.sum(flat, axis=1, dtype=jnp.int32)
    block_list = jnp.argsort(~flat, axis=1, stable=True)[:, :maxb].astype(
        jnp.int32
    )
    if block_list.shape[1] < maxb:  # small scenes: n_blocks < 128-row quantum
        block_list = jnp.pad(
            block_list, ((0, 0), (0, maxb - block_list.shape[1]))
        )
    block_count = jnp.where(block_count > maxb, -1, block_count)
    return block_list, block_count


def _bin_tri_masks(bbox_ok, t_cap, width, height, y0=0):
    """Per-(tile, block) 64-bit triangle masks -> (n_tiles, 2*n_blocks') i32
    (n_blocks' 64-padded so rows are 128-lane aligned; [2b] = bits for
    triangles 64b..64b+31, [2b+1] = 64b+32..64b+63).

    Bit k is set iff triangle 64b+k's bbox tile-interval contains the tile —
    conservative for actual coverage (covered pixel centers lie inside
    [xmin, xmax] x [ymin, ymax], so their tile indices lie inside the
    floor-interval). The kernel then replaces its 12-op per-triangle scalar
    bbox-compare chain with a 3-op bit test, and skips mask-empty block
    visits outright (a block's bbox UNION can overlap a tile no individual
    triangle touches). Work-term counts at the 1080p bench: 416k scalar
    iterations, 131k bbox passes — the miss path was ~3 ms of pure scalar
    compares.

    Build: a triangle's tile set is a RECTANGLE of tile coords, so the
    (n_tiles, T) overlap matrix is SEPARABLE — o[(ty,tx), t] =
    oy[ty, t] & ox[tx, t]. The factors are tiny ((n_ty + n_tx) x T bits vs
    n_tiles x T = 134 MB at the 1080p bench), and the byte fold becomes one
    fused multiply-reduce over the bit axis: bytes[ty, tx, j, blk] =
    sum_k oy[ty, ...] * (ox[tx, ...] * 2^k), exact in bf16 (products <=
    128, sums <= 255). The interval columns are pre-transposed to
    (j, k, blk) rows by one transposing identity dot per column (the
    _t_cols firewall) so the reduce runs over sublanes with blk as the
    128-aligned minor dim.

    History: the earlier non-separable formulation (materialize
    (n_tiles, T) bf16, one MXU byte-fold dot, one transposing dot) cost
    ~1.5 ms/frame at the 1080p bench; three OTHER non-separable variants
    (per-bit strided slices, trailing-64 3D, 512-lane block-diagonal dot)
    all measured slower than it. Separability is what they were missing."""
    from renderer_tpu.ops.geometry import _t_cols

    xmin, xmax, ymin, ymax, ok = bbox_ok
    n_ty, n_tx = height // TILE_H, width // TILE_W
    n_blocks = t_cap // BLOCK
    y0f = jnp.asarray(y0, jnp.float32)
    txi0 = jnp.floor(xmin * (1.0 / TILE_W))
    txi1 = jnp.floor(xmax * (1.0 / TILE_W))
    tyi0 = jnp.floor((ymin - y0f) * (1.0 / TILE_H))
    tyi1 = jnp.floor((ymax - y0f) * (1.0 / TILE_H))
    # Poison the x interval for dead triangles (empty interval == bit 0) and
    # clamp everything into a finite range: the transposing dot below
    # touches every entry of a 64-column row with zero weights, and
    # 0 * inf = NaN would poison the whole block row. Clamping to
    # [-1, n_t*] preserves the containment predicate exactly (tile coords
    # live in [0, n_t*-1]), and NaN bboxes always have ok == False
    # (their on-screen compare fails), so the where() removes them.
    def scrub(v, empty):
        # NaN -> empty-interval endpoint: clip() passes NaN through, and one
        # NaN inside a 64-column dot row would zero the whole block's masks
        return jnp.where(jnp.isnan(v), empty, v)

    txi0 = jnp.clip(scrub(jnp.where(ok, txi0, float(n_tx)), float(n_tx)), -1.0, float(n_tx))
    txi1 = jnp.clip(scrub(jnp.where(ok, txi1, -1.0), -1.0), -1.0, float(n_tx))
    tyi0 = jnp.clip(scrub(tyi0, float(n_ty)), -1.0, float(n_ty))
    tyi1 = jnp.clip(scrub(tyi1, -1.0), -1.0, float(n_ty))

    def fac(v):
        # (T,) -> (8, 8, n_blocks) = (j, k, blk) rows, t = 64*blk + 8*j + k
        return _t_cols(v.reshape(n_blocks, 64)).reshape(8, 8, n_blocks)

    ty_v = jnp.arange(n_ty, dtype=jnp.float32).reshape(n_ty, 1, 1, 1)
    tx_v = jnp.arange(n_tx, dtype=jnp.float32).reshape(n_tx, 1, 1, 1)
    oy = (fac(tyi0)[None] <= ty_v) & (ty_v <= fac(tyi1)[None])
    ox = (fac(txi0)[None] <= tx_v) & (tx_v <= fac(txi1)[None])
    p2 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.bfloat16)
    a = oy.astype(jnp.bfloat16)  # (n_ty, 8, 8, n_blocks)
    b = ox.astype(jnp.bfloat16) * p2.reshape(1, 1, 8, 1)
    bytes_f = jnp.sum(
        a[:, None] * b[None], axis=3, dtype=jnp.float32
    )  # (n_ty, n_tx, 8, n_blocks), each in [0, 255]
    bi = bytes_f.astype(jnp.int32)
    w0 = bi[:, :, 0] | (bi[:, :, 1] << 8) | (bi[:, :, 2] << 16) | (bi[:, :, 3] << 24)
    w1 = bi[:, :, 4] | (bi[:, :, 5] << 8) | (bi[:, :, 6] << 16) | (bi[:, :, 7] << 24)
    masks = jnp.stack([w0, w1], axis=2)  # (n_ty, n_tx, 2, n_blocks)
    # interleave per block: (n_tiles, n_blocks, 2) word order
    masks = jnp.swapaxes(masks, 2, 3).reshape(n_ty * n_tx, 2 * n_blocks)
    # 8-SMEM-row quantum for the mask DMA too (see maxb above)
    pad = _round_up(2 * n_blocks, 1024) - 2 * n_blocks
    if pad:
        masks = jnp.pad(masks, ((0, 0), (0, pad)))
    return masks


def _raster_kernel(
    n_blocks: int,
    with_bary: bool,
    full_unroll: bool,
    # scalar-prefetch inputs (SMEM, whole arrays)
    block_count_ref,  # (n_tiles,) i32; -1 = bin overflow, walk all blocks
    y0_ref,  # (1,) i32 row offset (sharded-image support)
    block_simple_ref,  # (n_blocks,) i32; 1 = all live triangles "simple"
    # inputs
    block_list_hbm,  # (n_tiles, MAXB) i32, HBM
    masks_hbm,  # (n_tiles, 2*n_blocks') i32, HBM — per-block 64-bit tri masks
    tri_hbm,  # (ROWS, T) f32, HBM
    # outputs (VMEM tile blocks)
    depth_ref,  # (TILE_H, TILE_W) f32
    id_ref,  # (TILE_H, TILE_W) i32
    b0_ref,  # (TILE_H, TILE_W) f32
    b1_ref,  # (TILE_H, TILE_W) f32
    # scratch
    list_smem,  # (MAXB,) i32 SMEM
    list_sem,  # DMA sem
    mask_smem,  # (2*n_blocks'//128, 128) i32 SMEM
    mask_sem,  # DMA sem
    buf,  # (4, BLOCK*ROWS//128, 128) f32 SMEM — scalar-read triangle records
    sem,  # (4,) DMA sems (paired visits: two DMAs in flight per pair)
    lam0_ref,  # (TILE_H, TILE_W) f32 VMEM — unnormalized winning barycentrics
    lam1_ref,
    lsum_ref,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * pl.num_programs(1) + tx
    maxb = list_smem.shape[0] * 128  # list stored as (MAXB//128, 128)

    # pull this tile's bin list + tri masks HBM -> SMEM (overlaps the clears)
    list_dma = pltpu.make_async_copy(block_list_hbm.at[tile], list_smem, list_sem)
    list_dma.start()
    mask_dma = pltpu.make_async_copy(masks_hbm.at[tile], mask_smem, mask_sem)
    mask_dma.start()

    raw_count = block_count_ref[tile]
    overflow = raw_count < 0
    count = jnp.where(overflow, n_blocks, raw_count)

    def block_id(i):
        """i-th block to process: list entry, or i itself on overflow."""
        j = jnp.minimum(i, maxb - 1)
        return jnp.where(overflow, i, list_smem[j // 128, j % 128])

    # depth is tracked as a rational z_num/w during the loop (w > 0 for all
    # covered pixels) so the per-triangle perspective divide disappears; the
    # same trick defers barycentric normalization. One divide per PIXEL at
    # the end instead of two vector divides per TRIANGLE VISIT.
    znum_ref = b0_ref  # reuse output buffers as accumulators during the loop
    wden_ref = b1_ref
    znum_ref[:] = jnp.full((TILE_H, TILE_W), DEPTH_CLEAR, jnp.float32)
    wden_ref[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)
    id_ref[:] = jnp.full((TILE_H, TILE_W), NO_TRIANGLE, jnp.int32)
    if with_bary:
        lam0_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        lam1_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        lsum_ref[:] = jnp.ones((TILE_H, TILE_W), jnp.float32)

    # tile pixel bounds for the per-triangle scalar bbox reject
    tx0 = tx.astype(jnp.float32) * TILE_W
    ty0 = ty.astype(jnp.float32) * TILE_H + y0_ref[0].astype(jnp.float32)
    # NOTE: vector work stays at full (TILE_H, TILE_W) granularity on
    # purpose. An (8, 128)-subtile split gated by scalar y-range tests was
    # measured SLOWER (33.2 vs 26.7 ms at the 1080p bench): the loop is
    # scalar/branch bound, and four pl.when branches per visit cost more
    # than the skipped vector issue slots.
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + tx0
        + 0.5
    )
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + ty0
        + 0.5
    )

    rows_per_block = BLOCK * ROWS // 128

    def start_dma(i, slot):
        blk = block_id(i)
        off = pl.multiple_of(blk * rows_per_block, rows_per_block)
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(off, rows_per_block), :], buf.at[slot], sem.at[slot]
        )

    list_dma.wait()  # must consume the semaphores even when count == 0
    mask_dma.wait()

    @pl.when(count > 0)
    def _():
        # PAIRED visits: each loop iteration consumes TWO bin-list entries
        # (4 SMEM slots, two DMAs in flight per direction) — halves the
        # fori_loop + prefetch-branch overhead per visit. Entries past
        # `count` are safe to visit: the argsort-compacted list's tail
        # holds non-overlapping block ids whose per-tile masks are all
        # zero (skipped), and the small-scene zero padding re-visits block
        # 0, which is idempotent (identical z_num/w_i lose the strict
        # depth compare).
        start_dma(0, 0).start()
        start_dma(1, 1).start()
        pairs = (count + 1) // 2

        def body(p, _):
            s0 = 2 * jax.lax.rem(p, 2)  # this pair's slots: s0, s0+1

            @pl.when(p + 1 < pairs)
            def _():
                nxt = 2 * (p + 1)
                start_dma(nxt, 2 - s0).start()
                start_dma(nxt + 1, 3 - s0).start()

            visit(2 * p, s0)
            visit(2 * p + 1, s0 + 1)
            return 0

        def visit(i, slot):
            # wait for this block's stripe
            blk = block_id(i)
            pltpu.make_async_copy(
                tri_hbm.at[
                    pl.ds(
                        pl.multiple_of(blk * rows_per_block, rows_per_block),
                        rows_per_block,
                    ),
                    :,
                ],
                buf.at[slot],
                sem.at[slot],
            ).wait()
            base = blk * BLOCK

            # this tile's 64-bit triangle mask for the block (two i32 words):
            # bit k = triangle base+k's bbox tile-interval contains this
            # tile. Replaces the per-triangle 4-load/4-compare scalar bbox
            # chain (the miss path was ~3 ms/frame of scalar issue at the
            # 1080p bench) and skips visits whose union-bbox overlap was
            # vacuous.
            j0 = 2 * blk
            w0 = mask_smem[j0 // 128, jax.lax.rem(j0, 128)]
            w1 = mask_smem[(j0 + 1) // 128, jax.lax.rem(j0 + 1, 128)]

            # Records live in SMEM: every per-triangle field is a SCALAR
            # read that broadcasts straight into the (SUB, TILE_W) vector
            # ops — no VMEM sublane slicing, no lane extraction (the VMEM
            # variant spent ~half its cycles there).
            def tri_one(k, fast):
                def s(col):
                    # records are 32-lane packed, 4 per physical 128-lane
                    # row: static (k, col) -> static (row, lane) in unrolled
                    # loops
                    flat = k * ROWS + col
                    return buf[slot, flat // 128, flat % 128]

                if isinstance(k, int):  # full unroll: static word pick/shift
                    word = w0 if k < 32 else w1
                    amt = k & 31
                else:
                    word = jnp.where(k < 32, w0, w1)
                    amt = k & 31
                hit_tile = (
                    jax.lax.shift_right_logical(word, amt) & 1
                ) != 0

                @pl.when(hit_tile)
                def _():
                    def edge(e):
                        a = s(_R_E + 3 * e)
                        b = s(_R_E + 3 * e + 1)
                        cc = s(_R_E + 3 * e + 2)
                        lam = a * px + b * py + cc
                        # one-compare top-left fill rule via the precomputed
                        # per-edge threshold (see _R_TE)
                        return lam, lam > s(_R_TE + e)

                    lam0, a0 = edge(0)
                    lam1, a1 = edge(1)
                    lam2, a2 = edge(2)
                    w_i = lam0 * s(_R_W) + lam1 * s(_R_W + 1) + lam2 * s(_R_W + 2)
                    z_num = lam0 * s(_R_Z) + lam1 * s(_R_Z + 1) + lam2 * s(_R_Z + 2)
                    # z in [0,1] and the depth test, divide-free (w_i > 0):
                    #   z >= 0         <=> z_num >= 0
                    #   z <= 1         <=> z_num <= w_i
                    #   z < z_ref      <=> z_num * w_ref < z_ref_num * w_i
                    # NOTE: no separate bbox test — for all-front triangles
                    # the three edge half-planes exactly bound coverage (the
                    # stored bbox is only the ±0.5-padded conservative hull,
                    # so it can never cut a covered pixel), and w-crossing
                    # triangles get a full-screen bbox anyway.
                    if fast:
                        # "simple" block (see _setup_tri_data): w_i > 0 and
                        # z_num in [0, w_i] hold by construction for covered
                        # pixels — edge coverage alone decides
                        covered = a0 & a1 & a2
                    else:
                        covered = (
                            a0 & a1 & a2
                            & (w_i > 0) & (z_num >= 0.0) & (z_num <= w_i)
                        )
                    closer = covered & (z_num * wden_ref[:] < znum_ref[:] * w_i)
                    znum_ref[:] = jnp.where(closer, z_num, znum_ref[:])
                    wden_ref[:] = jnp.where(closer, w_i, wden_ref[:])
                    id_ref[:] = jnp.where(closer, base + k, id_ref[:])
                    if with_bary:
                        lam0_ref[:] = jnp.where(closer, lam0, lam0_ref[:])
                        lam1_ref[:] = jnp.where(closer, lam1, lam1_ref[:])
                        lsum_ref[:] = jnp.where(closer, lam0 + lam1 + lam2, lsum_ref[:])

            def run_block(fast):
                if full_unroll:
                    # FULLY unrolled: k is a Python constant, so the mask
                    # word pick and shift amount are static and the
                    # scheduler can overlap scalar loads/branches across
                    # triangles (12.95 vs 14.02 ms at the 1080p bench).
                    # Interpret mode (CPU tests) keeps the x4 loop — the
                    # unrolled trace interprets ~4x slower.
                    for k in range(BLOCK):
                        tri_one(k, fast)
                else:
                    def tri4(k2, _):
                        for j in range(4):
                            tri_one(4 * k2 + j, fast)
                        return 0

                    jax.lax.fori_loop(0, BLOCK // 4, tri4, 0)

            # one branch per BLOCK visit picks the specialized loop; visits
            # whose mask is empty (union-bbox overlap, no individual
            # triangle) skip the whole 64-iteration loop
            nonempty = (w0 | w1) != 0
            is_simple = block_simple_ref[blk]

            @pl.when(nonempty & (is_simple != 0))
            def _():
                run_block(True)

            @pl.when(nonempty & (is_simple == 0))
            def _():
                run_block(False)

        jax.lax.fori_loop(0, (count + 1) // 2, body, 0)

    # epilogue: resolve the rationals ONCE per tile (order matters — depth
    # reads znum/wden which alias the b0/b1 output buffers)
    depth_ref[:] = znum_ref[:] / wden_ref[:]  # wden >= min(1, w_i) > 0
    if with_bary:
        inv = 1.0 / jnp.where(lsum_ref[:] != 0.0, lsum_ref[:], 1.0)
        b0_ref[:] = lam0_ref[:] * inv
        b1_ref[:] = lam1_ref[:] * inv
    else:
        # barycentrics are re-derived in shading from the record's edge
        # coefficients (SR_EDGE); zero the buffers for deterministic output
        b0_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        b1_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)


@functools.partial(jax.jit, static_argnames=("width", "height", "cull_backface"))
def bin_overflow_tiles(
    clip: jnp.ndarray, valid: jnp.ndarray, width: int, height: int,
    cull_backface: bool = True,
) -> jnp.ndarray:
    """() i32 — tiles whose bin list overflowed MAX_BLOCKS_PER_TILE this
    frame (those tiles silently degrade to walk-all-blocks: correct but a
    perf cliff; surfaced in the HUD so it's observable)."""
    _, bbox_ok, _ = _setup_tri_data(clip, valid, width, height, cull_backface)
    masks = _bin_tri_masks(bbox_ok, clip.shape[0], width, height)
    _, block_count = _bin_blocks_from_masks(masks, clip.shape[0] // BLOCK)
    return jnp.sum((block_count < 0).astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cull_backface", "interpret", "full_height", "with_bary"),
)
def rasterize_pallas(
    clip: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    cull_backface: bool = True,
    count=None,  # accepted for API parity; binning already skips dead blocks
    interpret: bool = False,
    y0=0,  # may be traced: render rows [y0, y0+height) of a full_height image
    full_height: int = None,
    with_bary: bool = True,  # False: depth+id only (bary re-derived in shade)
) -> VisibilityBuffer:
    """Drop-in replacement for ops.raster_jax.rasterize (same spec/outputs).

    Requires width % 128 == 0 and height % TILE_H == 0 and T % BLOCK == 0.
    y0/full_height support row-sharded framebuffers (renderer_tpu.parallel).
    """
    del count
    if full_height is None:
        full_height = height
    t_cap = clip.shape[0]
    assert t_cap % BLOCK == 0, (t_cap, BLOCK)
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    n_ty, n_tx = height // TILE_H, width // TILE_W
    n_blocks = t_cap // BLOCK

    tri_data, bbox_ok, simple = _setup_tri_data(
        clip, valid, width, full_height, cull_backface
    )
    # tile grid covers only this shard's rows, offset by y0 in pixel space;
    # the bin lists come FROM the masks (strictly tighter than bbox-union
    # overlap, and one overlap computation instead of two)
    masks = _bin_tri_masks(bbox_ok, t_cap, width, height, y0=y0)
    block_list, block_count = _bin_blocks_from_masks(masks, t_cap // BLOCK)
    # per-block fast-path flag: every LIVE triangle in the block is simple
    # (dead ones are rejected by their zero mask bits either way)
    block_simple = jnp.all(
        (simple | ~bbox_ok[4]).reshape(n_blocks, BLOCK), axis=1
    ).astype(jnp.int32)

    # per-tile bin counts ride scalar prefetch (tiny, SMEM-resident); the
    # bin LISTS live in HBM and are DMA'd per tile into SMEM scratch — lists
    # at 1080p scale (n_tiles x 1024 i32) far exceed the ~1 MB SMEM budget
    maxb = block_list.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # block lists, HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tri masks, HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tri_data, HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
        ],
        scratch_shapes=[
            pltpu.SMEM((maxb // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((masks.shape[1] // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((4, BLOCK * ROWS // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
        ],
    )
    depth, tri_id, b0, b1 = pl.pallas_call(
        functools.partial(_raster_kernel, n_blocks, with_bary, not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(
        block_count.reshape(n_ty * n_tx),
        jnp.asarray(y0, jnp.int32).reshape(1),
        block_simple,
        block_list.reshape(n_ty * n_tx, maxb // 128, 128),
        masks.reshape(n_ty * n_tx, masks.shape[1] // 128, 128),
        tri_data,
    )

    bary = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=0)  # channel-first (3,H,W)
    bary = jnp.where((tri_id != NO_TRIANGLE)[None], bary, 0.0)
    return VisibilityBuffer(depth=depth, tri_id=tri_id, bary=bary)

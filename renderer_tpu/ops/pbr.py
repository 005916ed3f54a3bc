"""PBR metallic-roughness deferred shading (GGX + Smith + Schlick).

The TPU re-expression of the reference's forward fragment shader
gltf_mesh.frag (TBN normal mapping frag/vert:46-71, GGX specular
frag:90-134, two lights, shadow lookup) as whole-framebuffer array math.

Everything is CHANNEL-FIRST: vectors are (3, H, W), scalars (H, W) — TPU
tiled layouts pad the trailing two dims to (8, 128), so channel-last
(H, W, 3) temporaries would cost ~42x their logical size (measured: a single
packed channel-last gather ballooned to 16 GB at 1080p).

Shadow terms plug in via ops/shadow.py; `shadow=None` means fully lit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from renderer_tpu.ops.raster_jax import VisibilityBuffer
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.ops.texture import sample_atlas_cf, srgb_to_linear
from renderer_tpu.scene.types import Scene


def _normalize_cf(v, eps=1e-8):
    """(3, H, W) -> unit vectors."""
    n = jnp.sqrt(_dot_cf(v, v))
    return v / jnp.maximum(n, eps)


def _dot_cf(a, b):
    """(3, H, W) x (3, H, W) -> (1, H, W). Unrolled adds, not a reduce op:
    cross-channel reduces compile to separate multiply_reduce fusions (~8 x
    0.2 ms/frame at 1080p); plain FMAs fuse into their consumers. Same
    order as the 3-wide reduce ((x0+x1)+x2), so values are unchanged."""
    return ((a[0] * b[0] + a[1] * b[1]) + a[2] * b[2])[None]


def _cross_cf(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def _ggx_brdf(n, v, l, albedo, metallic, roughness):
    """Cook-Torrance specular + Lambert diffuse, channel-first.
    n/v/l/albedo: (3,H,W); metallic/roughness: (1,H,W)."""
    h = _normalize_cf(v + l)
    ndl = jnp.maximum(_dot_cf(n, l), 0.0)
    ndv = jnp.maximum(_dot_cf(n, v), 1e-4)
    ndh = jnp.maximum(_dot_cf(n, h), 0.0)
    vdh = jnp.maximum(_dot_cf(v, h), 0.0)

    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(jnp.pi * denom * denom, 1e-9)
    gv = ndl * jnp.sqrt(ndv * ndv * (1 - a2) + a2)
    gl = ndv * jnp.sqrt(ndl * ndl * (1 - a2) + a2)
    vis = 0.5 / jnp.maximum(gv + gl, 1e-9)
    f0 = 0.04 * (1.0 - metallic) + albedo * metallic
    f = f0 + (1.0 - f0) * (1.0 - vdh) ** 5

    specular = d * vis * f
    diffuse = albedo * (1.0 - metallic) * (1.0 - f) / jnp.pi
    return (diffuse + specular) * ndl


def shade_pbr(
    vis: VisibilityBuffer,
    shade_rec: jnp.ndarray,  # (T, SR_COLS) records (geometry.build_shade_records)
    scene: Scene,
    camera_pos: jnp.ndarray,
    viewproj_inv: jnp.ndarray = None,
    shadow=None,  # optional (shadow_depth (n_slots,S,S), light_mats (L,4,4))
    background=(0.05, 0.05, 0.08),
    ambient: float = 0.03,
    y0=0,
    full_height: int = None,
    enable_textures: bool = True,
    enable_normal_maps: bool = True,
    trilinear: bool = True,
    rt=None,  # (tri_world (T,3,3), tri_valid, count, rt_scale): ray shadows
    # accelerated ray shadows (ops/rt_grid.py): (light_mats, lod, model,
    # scene_radius, caster_capacity, interpret) — per-light caster expansion
    # + light-space-binned Pallas traversal; replaces `rt` when set
    rt_grid=None,
    bary_from_records: bool = False,  # derive b0..b2 from SR_EDGE coefficients
    # shade only the first k light-table slots (None = all). The reference
    # hard-codes 2 lights (gltf_mesh.frag); the Renderer auto-sets this to
    # the scene's live light count so dead table slots skip their GGX.
    light_slots: int = None,
    # checkerboard shade tier (PipelineConfig.shade_rate): run the whole
    # per-pixel pipeline on the (x+y)-even half-lattice packed to (H, W/2)
    # — halving the two index-rate-bound record/texture gathers that
    # dominate this pass — and reconstruct the complement from
    # same-triangle cardinal neighbors (see _checkerboard_expand)
    checkerboard: bool = False,
    # quarter-rate shade tier: shade only the (even x, even y) lattice
    # packed to (H/2, W/2) — halving the gathers AGAIN vs checkerboard —
    # and reconstruct the three complement classes from their shaded
    # neighbors (H: left/right; V: up/down; D: four diagonals, trimmed
    # mean). The sparse fix re-shades the worst suspects of ALL classes
    # (see _quarter_expand/_quarter_fix). The TPU-native expression of
    # hardware 2x2 variable-rate shading, per-pixel-adaptive via the fix.
    quarter: bool = False,
    # checkerboard edge fix: exactly re-shade the worst reconstructed pixels
    # (same-triangle neighbor color spread ranks them; capacity P/FIX_K_DIV).
    # On pure-geometry content errors sit on triangle-edge pixels; with
    # normal maps they also spread over interiors (per-pixel normal
    # variation), so K = P/16 + the normal-map LOD bias + Toksvig keep the
    # bench's min-pose PSNR at 40.9 dB (scripts/prof_cbfix.py NM=1,
    # PERF.md round-4 session 2). Skipped when rt/rt_grid shadows are
    # active (the screen-tile rt kernels need the full 2D lattice).
    shade_fix: bool = True,
    # edge-aware AA (ops/aa.py): FXAA-class directional blend on
    # triangle-ID edges only — the production tier replacing the
    # reference's always-on 4xMSAA (renderer.rs:1047-1087) at ~1-2 ms
    # instead of SSAA's 4x pixel cost
    aa: bool = False,
    # STATIC light-cast specialization: tuple of (shadow_slot, directional)
    # per shaded light slot, read from the scene at Renderer construction
    # (slot < 0 = no shadow). Replaces the per-light casts/is_point
    # lax.conds with compile-time branches — the conds' presence also
    # evicted the texture quad table from VMEM staging (measured 3.75 ->
    # 22.8 ms on the texture gather). None keeps the dynamic conds (the
    # pattern may change per frame). Same contract as light_slots: the
    # scene's slot/kind pattern must not change at render() time.
    static_casts: tuple = None,
    # SPMD mesh axis name when the framebuffer is row-sharded: the
    # checkerboard reconstruction exchanges its shard-edge neighbor rows
    # over ICI (see _halo_rows) so sharded == single-device exactly
    halo_axis: str = None,
    _upto: str = None,  # diagnostic DCE prefix: "gather"|"interp"|"tex"
) -> jnp.ndarray:
    from renderer_tpu.ops.geometry import (
        SR_BASE,
        SR_BC_LAYER,
        SR_EDGE,
        SR_EMISSIVE,
        SR_METALLIC,
        SR_NM_LAYER,
        SR_NORMAL,
        SR_ROUGH,
        SR_TANGENT,
        SR_TEXLOD,
        SR_UV,
        unproject_depth,
    )

    fh_, fw_ = vis.depth.shape  # full framebuffer dims
    assert not (checkerboard and quarter)
    if quarter:
        # pack the (even x, even y) shaded lattice to (H/2, W/2): strided
        # slices only (no gathers); y0 is even under SPMD row sharding, so
        # local even rows are global even rows
        assert fw_ % 2 == 0 and fh_ % 2 == 0
        h_, w_ = fh_ // 2, fw_ // 2
        depth_in = vis.depth[0::2, 0::2]
        tri_in = vis.tri_id[0::2, 0::2]
        px = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 1) + 0.5
        py = (
            2.0 * jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 0)
            + jnp.asarray(y0, jnp.float32) + 0.5
        )
        bary_in = (
            None if bary_from_records else vis.bary[:, 0::2, 0::2]
        )
    elif checkerboard:
        # Pack the shaded half-lattice ((x + y_abs) even) to (H, W/2):
        # x = 2*j + ((y + y0) & 1). Shaded pixels run the EXACT math at
        # their true pixel centers via explicit px/py; y0 keeps the
        # pattern globally consistent across SPMD row shards.
        assert fw_ % 2 == 0
        h_, w_ = fh_, fw_ // 2
        rowpar = (
            jax.lax.broadcasted_iota(jnp.int32, (h_, 1), 0)
            + jnp.asarray(y0, jnp.int32)
        ) & 1

        def _pack(a):  # full (H, W) -> shaded lattice (H, W/2)
            return jnp.where(rowpar == 0, a[:, 0::2], a[:, 1::2])

        depth_in = _pack(vis.depth)
        tri_in = _pack(vis.tri_id)
        px = (
            2.0 * jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 1)
            + rowpar.astype(jnp.float32) + 0.5
        )
        py = (
            jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 0)
            + jnp.asarray(y0, jnp.float32) + 0.5
        )
        bary_in = (
            None if bary_from_records
            else jnp.stack([_pack(vis.bary[c]) for c in range(3)])
        )
    else:
        h_, w_ = fh_, fw_
        depth_in, tri_in = vis.depth, vis.tri_id
        px = py = None  # implicit pixel-center grid
        bary_in = vis.bary

    def _run(depth_in, tri_in, px, py, bary_in):
        """The per-sample shading core on any 2D grid of samples.

        px/py give explicit pixel-center coordinates (None = the implicit
        full-framebuffer grid); every op is shape-generic, so the same
        closure shades the full frame, the packed checkerboard lattice,
        AND the sparse (8, K/8) suspect-pixel batch of the edge fix —
        re-shaded pixels match the full-rate path by construction (same
        expressions; only cross-shape fusion/FMA-contraction noise at the
        ulp scale separates them)."""
        h_, w_ = depth_in.shape
        covered = tri_in != NO_TRIANGLE
        safe_id = jnp.maximum(tri_in, 0)

        world = unproject_depth(
            depth_in, viewproj_inv, fw_, fh_, y0=y0,
            # explicit: the sparse fix batch is (8, K/8)-shaped, so the
            # depth-shape default would be wrong there
            full_height=full_height if full_height is not None else fh_,
            px=px, py=py,
        )  # (3, H, W)

        # THE gather: one contiguous 256-byte row per pixel, then ONE
        # transposing selector dot (rows of the identity, exact f32) to a
        # (45, P) column table. The dot pins the gather's row-major layout
        # (same firewall as geometry._t_cols) and every later column read is a
        # free contiguous row instead of a lane-strided slice of the 1 GB
        # (H, W, 128) block — each consumer fusion re-scanned that whole block
        # before (~8 ms/frame at 1080p, PERF.md round-3).
        # Row ORDER groups rows by CONSUMER ACCESS PATTERN so each extraction
        # fusion reads only the (8,128)-tile sublane rows it needs:
        # - 0..23: the 8 interpolated attributes per corner, three contiguous
        #   blocks — barycentric interpolation is ONE fused (8, P) FMA instead
        #   of ~12 per-attribute slice fusions (~0.115 ms each at 1080p);
        # - 24..29 flat scalars + 30..38 edge coefficients: everything consumed
        #   as individual (P,) rows sits in two adjacent sublane tile-rows, so
        #   the multi-output row-extraction fusion reads ~1/3 of the table
        #   instead of scanning all 45 rows (was 0.89 ms at 1080p);
        # - 39..44: the two (3, P) block reads (base color, emissive) last.
        _corner = lambda c: (
            [SR_NORMAL + 3 * c + k for k in range(3)]
            + [SR_UV + 2 * c, SR_UV + 2 * c + 1]
            + [SR_TANGENT + 4 * c + k for k in range(3)]
        )
        _const = (
            [SR_TEXLOD, SR_METALLIC, SR_ROUGH, SR_BC_LAYER, SR_NM_LAYER,
             SR_TANGENT + 3]
            + [SR_EDGE + k for k in range(9)]
            + [SR_BASE + k for k in range(3)]
            + [SR_EMISSIVE + k for k in range(3)]
        )
        order = _corner(0) + _corner(1) + _corner(2) + _const
        c_off = 24  # first constant row
        p_ = h_ * w_
        rows = shade_rec[safe_id.reshape(p_)]  # (P, SR_COLS) row-major gather
        sel = np.zeros((len(order), shade_rec.shape[-1]), np.float32)
        sel[np.arange(len(order)), np.array(order)] = 1.0
        cols_t = jax.lax.dot_general(
            jnp.asarray(sel), rows, (((1,), (1,)), ((), ())),
            precision="highest",
        )  # (45, P)
        col = lambda k: cols_t[c_off + _const.index(k)].reshape(h_, w_)
        if bary_from_records:
            # visibility-buffer style: evaluate the winner's edge functions at
            # the pixel center (same expression the rasterizer used); the raster
            # kernel then only stores depth+id
            if px is None:
                px = jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 1) + 0.5
                py = (
                    jax.lax.broadcasted_iota(jnp.float32, (h_, w_), 0)
                    + jnp.asarray(y0, jnp.float32) + 0.5
                )
            pxf = px.reshape(p_)
            pyf = py.reshape(p_)
            # flat (P,) row math over the contiguous SR_EDGE rows — an
            # (3, 3, P)-shaped formulation padded its sublane dim 3 -> 8 and
            # materialized ~1 ms/frame of slice+reshape at 1080p
            e = lambda k: cols_t[c_off + 6 + k]  # (P,) contiguous row
            lam0 = e(0) * pxf + e(1) * pyf + e(2)
            lam1 = e(3) * pxf + e(4) * pyf + e(5)
            lam2 = e(6) * pxf + e(7) * pyf + e(8)
            lsum = lam0 + lam1 + lam2
            inv = 1.0 / jnp.where(lsum != 0.0, lsum, 1.0)
            # materialize once: every interpolation consumes b, and without a
            # barrier XLA re-derives the whole edge evaluation inside each
            # consumer fusion (measured +16 ms at 1080p)
            b0, b1, b2 = jax.lax.optimization_barrier(
                (lam0 * inv, lam1 * inv, lam2 * inv)
            )
            b0 = b0.reshape(h_, w_)
            b1 = b1.reshape(h_, w_)
            b2 = b2.reshape(h_, w_)
        else:
            b0, b1, b2 = bary_in[0], bary_in[1], bary_in[2]

        if _upto == "gather":  # records gather + bary + unproject only
            return jnp.sum(cols_t[0]) + jnp.sum(b0) + jnp.sum(world)

        # ONE (8, P) FMA interpolates all corner attributes at once (the three
        # contiguous corner blocks of cols_t; see `order` above)
        b0p = b0.reshape(1, p_)
        b1p = b1.reshape(1, p_)
        b2p = b2.reshape(1, p_)
        attrs = b0p * cols_t[0:8] + b1p * cols_t[8:16] + b2p * cols_t[16:24]
        n_geom = _normalize_cf(attrs[0:3].reshape(3, h_, w_))
        u = attrs[3].reshape(h_, w_)
        v_ = attrs[4].reshape(h_, w_)
        tangent = attrs[5:8].reshape(3, h_, w_)
        tan_w = col(SR_TANGENT + 3)[None]  # handedness is per-triangle constant
        tex_lod = col(SR_TEXLOD)

        # contiguous row-block reads (no per-channel stacks)
        base_factor = cols_t[c_off + 15 : c_off + 18].reshape(3, h_, w_)
        metallic = col(SR_METALLIC)[None]
        roughness = col(SR_ROUGH)[None]
        emissive = cols_t[c_off + 18 : c_off + 21].reshape(3, h_, w_)
        bc_layer = col(SR_BC_LAYER).astype(jnp.int32)
        nm_layer = col(SR_NM_LAYER).astype(jnp.int32)

        if _upto == "interp":  # + all attribute interpolation, no texturing
            return (
                jnp.sum(n_geom) + jnp.sum(u) + jnp.sum(v_) + jnp.sum(tangent)
                + jnp.sum(base_factor) + jnp.sum(metallic) + jnp.sum(roughness)
                + jnp.sum(emissive) + jnp.sum(bc_layer) + jnp.sum(tex_lod)
            )

        if enable_textures:
            bc = sample_atlas_cf(scene.atlas, bc_layer, u, v_, tex_lod, trilinear=trilinear)
            albedo = base_factor * srgb_to_linear(bc[0:3])
        else:
            albedo = base_factor

        if _upto == "tex":  # + base-color texture sampling
            return jnp.sum(albedo)

        if enable_textures and enable_normal_maps:
            t = tangent
            t = _normalize_cf(t - n_geom * _dot_cf(t, n_geom))
            b = _cross_cf(n_geom, t) * tan_w
            # normal-map LOD bias: sample normals one mip softer than color.
            # At the mip transition a bump map's normals vary at ~pixel
            # frequency — shimmer in the exact frame (and unreconstructable
            # detail for the checkerboard tier). One extra level of
            # filtering removes the pixel-rate variation; the Toksvig term
            # below converts the filtered-away variance into roughness, so
            # energy response stays consistent (standard normal-map
            # filtering practice; the reference samples normal maps with
            # hardware trilinear+aniso which performs the same smoothing).
            nm = sample_atlas_cf(
                scene.atlas, nm_layer, u, v_, tex_lod + NM_LOD_BIAS,
                trilinear=trilinear,
            )
            nx, ny, nz = nm[0] * 2 - 1, nm[1] * 2 - 1, nm[2] * 2 - 1
            n_mapped = _normalize_cf(t * nx[None] + b * ny[None] + n_geom * nz[None])
            n = jnp.where((nm_layer >= 0)[None], n_mapped, n_geom)
            # Toksvig specular AA: mip-filtering AVERAGES unit normals, so
            # the filtered vector's length ell <= 1 encodes the normal
            # variance inside the texel footprint (sigma^2 ~= (1-ell)/ell).
            # Fold it into GGX roughness (alpha'^2 = alpha^2 + sigma^2) so
            # minified bump maps light as rough instead of sparkling —
            # per-pixel specular aliasing is the dominant error of BOTH the
            # aliased exact frame and the checkerboard reconstruction on
            # normal-mapped content (scripts/prof_cbfix.py NM=1: errors
            # spread over every den class, invisible to neighbor ranking).
            len2 = jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-6)[None]
            ell = jnp.sqrt(len2)
            sigma2 = jnp.clip((1.0 - ell) / ell, 0.0, 1.0)
            alpha2 = jnp.square(roughness * roughness) + sigma2
            rough_eff = jnp.sqrt(jnp.sqrt(jnp.minimum(alpha2, 1.0)))
            roughness = jnp.where((nm_layer >= 0)[None], rough_eff, roughness)
        else:
            n = n_geom

        rt_occ_slots = None  # per-SLOT occlusion planes (grid or brute force)
        if rt_grid is not None:
            from renderer_tpu.ops.rt_grid import rt_shadow_grid

            (light_mats, lod_i, model, radius, caster_cap, n_slots,
             interp_flag) = rt_grid[:7]
            rt_scale = rt_grid[7] if len(rt_grid) > 7 else 1
            rt_occ_slots = rt_shadow_grid(
                scene, world, n_geom, covered, light_mats, lod_i, model,
                radius, caster_cap, n_slots, interpret=interp_flag,
                tri=tri_in, rt_scale=rt_scale, halo_axis=halo_axis,
            )
        elif rt is not None:
            from renderer_tpu.ops.rt import rt_shadow_planes

            tri_w, tri_v, tri_count, n_slots, rt_scale = rt
            rt_occ_slots = rt_shadow_planes(
                world, n_geom, scene.lights, tri_w, tri_v, tri_count, n_slots,
                rt_scale,
            )

        v = _normalize_cf(camera_pos[:, None, None] - world)
        lights = scene.lights
        color = albedo * ambient + emissive
        n_slots_shaded = lights.alive.shape[0]
        if light_slots is not None:
            n_slots_shaded = min(light_slots, n_slots_shaded)
        for li in range(n_slots_shaded):
            on = lights.alive[li]
            to_light = jnp.where(
                lights.directional[li],
                -lights.position[li][:, None, None] * jnp.ones_like(world),
                lights.position[li][:, None, None] - world,
            )
            dist2 = _dot_cf(to_light, to_light)
            l = to_light / jnp.sqrt(jnp.maximum(dist2, 1e-12))
            atten = jnp.where(lights.directional[li], 1.0, 1.0 / jnp.maximum(dist2, 1e-4))
            radiance = lights.color[li][:, None, None] * (lights.intensity[li] * atten)
            if rt_occ_slots is not None:
                # any shadow-slot light traces (the grid path runs point lights
                # per cube face; the brute-force fallback fills point slots with
                # 1.0, so the multiply is a no-op there)
                slot = lights.shadow_slot[li]
                use = (slot >= 0) & on
                occ_l = rt_occ_slots[jnp.maximum(slot, 0)]
                radiance = radiance * jnp.where(use, occ_l, 1.0)[None]
            if shadow is not None:
                from renderer_tpu.ops.shadow import shadow_occlusion

                shadow_depth, light_mats = shadow
                st = None if static_casts is None else (
                    static_casts[li] if li < len(static_casts) else (-1, True)
                )
                if st is not None:
                    # STATIC light-cast specialization (the Renderer read the
                    # scene's slot/kind pattern at construction, like the
                    # light-count specialization): the casts/is_point conds
                    # vanish from the program. Beyond their own overhead,
                    # the conds blocked VMEM staging of the TEXTURE quad
                    # table in the same program — a measured 3.75 -> 22.8 ms
                    # regression of the texture gather whenever the
                    # conditional shadow path was live.
                    s_slot, s_dir = st
                    if 0 <= s_slot < shadow_depth.shape[0]:
                        ndl_geom = jnp.maximum(_dot_cf(n_geom, l), 0.0)
                        occl = shadow_occlusion(
                            world, ndl_geom, light_mats[li],
                            shadow_depth[s_slot],
                            normal=n_geom,
                            is_point=not s_dir,
                            light_pos=lights.position[li],
                        )
                        radiance = radiance * occl
                else:
                    slot = lights.shadow_slot[li]
                    casts = (slot >= 0) & on
                    ndl_geom = jnp.maximum(_dot_cf(n_geom, l), 0.0)
                    # cond, not where: a light with no shadow slot must SKIP
                    # the whole 2M-pixel lookup at runtime, not
                    # compute-and-mask it
                    occl = jax.lax.cond(
                        casts,
                        lambda: shadow_occlusion(
                            world, ndl_geom, light_mats[li],
                            shadow_depth[jnp.maximum(slot, 0)],
                            normal=n_geom,
                            is_point=~lights.directional[li],
                            light_pos=lights.position[li],
                        ),
                        lambda: jnp.ones((1,) + world.shape[1:], jnp.float32),
                    )
                    radiance = radiance * occl
            contrib = _ggx_brdf(n, v, l, albedo, metallic, roughness) * radiance
            color = color + jnp.where(on, contrib, 0.0)

        bg = jnp.asarray(background, jnp.float32)[:, None, None]
        color = jnp.where(covered[None], color, bg)
        return color

    color = _run(depth_in, tri_in, px, py, bary_in)
    if _upto:
        return color  # diagnostic scalar from the DCE prefix
    if quarter:
        bg = jnp.asarray(background, jnp.float32)[:, None, None]
        cov_s = tri_in != NO_TRIANGLE
        color, scores = _quarter_expand(
            color, vis.tri_id, tri_in, cov_s, bg, halo_axis=halo_axis
        )
        if shade_fix and rt is None and rt_grid is None:
            color = _quarter_fix(
                color, scores, vis, y0, _run, bary_from_records
            )
    elif checkerboard:
        bg = jnp.asarray(background, jnp.float32)[:, None, None]
        cov_s = tri_in != NO_TRIANGLE
        recon, score, tri_u = _checkerboard_expand(
            color, vis.tri_id, tri_in, cov_s, rowpar, bg,
            halo_axis=halo_axis,
        )
        color = _cb_interleave(color, recon, rowpar)
        if shade_fix and rt is None and rt_grid is None:
            # the fix scatters into the INTERLEAVED frame: scattering into
            # the packed recon lattice measured 1.8 ms SLOWER — it forces
            # recon to materialize where it otherwise fuses into the
            # interleave pads
            color = _checkerboard_fix(
                color, score, tri_u, vis, rowpar, y0, _run,
                bary_from_records,
            )
    if aa:
        from renderer_tpu.ops.aa import edge_aa

        color = edge_aa(color, vis.tri_id, halo_axis=halo_axis)
    return jnp.moveaxis(color, 0, -1)  # (H, W, 3) only at the boundary


FIX_TAU = 0.04  # neighbor-spread threshold (sum over channels, HDR)
NM_LOD_BIAS = 1.5  # normal maps sample ~one mip softer than color (see use)
# fix capacity divisor: K = P/FIX_K_DIV suspects. 16 on normal-mapped
# content (errors spread wider than pure geometry edges); the bench gate
# measures the result either way.
FIX_K_DIV = 16


def _checkerboard_fix(color, score, tri_u, vis, rowpar, y0, run,
                      bary_from_records):
    """Exactly re-shade the worst reconstructed pixels (sparse).

    approx-top-k by neighbor-spread score picks up to K = max(2048, P/16)
    suspect pixels from the complement lattice; they are re-shaded through
    the SAME shading closure on an (8, K/8) pseudo-image with explicit
    pixel-center coordinates — matching what the full-rate path would
    produce at those pixels (same expressions; ulp-scale cross-shape fusion
    noise only) — and scattered into the interleaved frame. Capacity
    overflow drops the LOWEST-spread suspects first (deterministic; under
    SPMD each row shard has its own proportional capacity, identical to
    single-device whenever no shard truncates)."""
    h_, w_ = score.shape
    p2 = h_ * w_
    k = min(p2 - p2 % 8, max(2048, -(-p2 // FIX_K_DIV) // 8 * 8))
    # approx_max_k: the TPU-native partial sort instead of exact top_k's
    # full merge network (0.95 vs 1.2 ms over the 1M lattice at the 1080p
    # bench). Selection is a HEURISTIC ranking — a ~5% recall miss swaps a
    # high-spread suspect for the next one down, which the FIX_TAU
    # threshold and the K headroom absorb (bench PSNR measured unchanged:
    # 40.95 dB both ways).
    vals, idx = jax.lax.approx_max_k(score.reshape(p2), k, recall_target=0.95)
    # sort the suspects by pixel index: the final scatter with ASCENDING
    # indices runs ~4x faster than with approx_max_k's arbitrary order
    # (measured standalone at K=65k: 32.6 -> 7.9 ms; the 1-wide
    # depth/tri gathers below get the locality too)
    idx, vals = jax.lax.sort((idx, vals), dimension=0, num_keys=1)
    good = vals > FIX_TAU
    par0 = rowpar == 0
    depth_u = jnp.where(par0, vis.depth[:, 1::2], vis.depth[:, 0::2])
    d_k = depth_u.reshape(p2)[idx]
    t_k = jnp.where(good, tri_u.reshape(p2)[idx], NO_TRIANGLE)
    yk = idx // w_
    jk = idx % w_
    park = (yk + jnp.asarray(y0, jnp.int32)) & 1  # complement: x = 2j+1-par
    px_k = (2 * jk + (1 - park)).astype(jnp.float32) + 0.5
    py_k = yk.astype(jnp.float32) + jnp.asarray(y0, jnp.float32) + 0.5
    shape2 = (8, k // 8)
    bary_k = None
    if not bary_from_records:
        bary_u = jnp.where(
            par0[None], vis.bary[:, :, 1::2], vis.bary[:, :, 0::2]
        )
        bary_k = bary_u.reshape(3, p2)[:, idx].reshape((3,) + shape2)
    color_k = run(
        d_k.reshape(shape2), t_k.reshape(shape2),
        px_k.reshape(shape2), py_k.reshape(shape2), bary_k,
    ).reshape(3, k)
    fw_ = color.shape[-1]
    flat = jnp.where(good, yk * fw_ + 2 * jk + (1 - park), h_ * fw_)  # OOB=drop
    out = color.reshape(3, h_ * fw_).at[:, flat].set(
        color_k, mode="drop", unique_indices=True
    )
    return out.reshape(color.shape)


def _halo_rows(a, halo_axis):
    """(above_row, below_row) of shape (..., 1, W2) for the packed lattice.

    Single-device (halo_axis None): clamp rows — the array's own first/last
    row (the global image edge behavior). Under SPMD row sharding the shard
    edge is an INTERIOR image row, so the true neighbor rows live on the
    adjacent shards: one ppermute each way exchanges them over ICI (~one
    row of traffic), and the global top/bottom shards substitute the clamp
    row (ppermute delivers zeros where no source maps)."""
    up_row = a[..., :1, :]
    dn_row = a[..., -1:, :]
    if halo_axis is None:
        return up_row, dn_row
    n = jax.lax.axis_size(halo_axis)
    if n == 1:
        return up_row, dn_row
    i = jax.lax.axis_index(halo_axis)
    from_above = jax.lax.ppermute(
        dn_row, halo_axis, [(k, k + 1) for k in range(n - 1)]
    )  # shard i receives shard i-1's LAST row; shard 0 gets zeros
    from_below = jax.lax.ppermute(
        up_row, halo_axis, [(k + 1, k) for k in range(n - 1)]
    )  # shard i receives shard i+1's FIRST row; shard n-1 gets zeros
    above = jnp.where(i == 0, up_row, from_above)
    below = jnp.where(i == n - 1, dn_row, from_below)
    return above, below


def _checkerboard_expand(shaded, tri_full, tri_s, cov_s, rowpar, bg,
                         halo_axis=None):
    """(3, H, W/2) shaded half-lattice -> (3, H, W) full frame.

    Each missing pixel ((x + y) odd) averages its four cardinal neighbors —
    all of which are shaded — weighted by same-triangle membership, so edges
    never bleed across surfaces; covered-neighbor average is the fallback
    when no neighbor shares the pixel's triangle (sub-pixel slivers), and
    uncovered pixels take the background exactly. Interior error is the
    discrete Laplacian of a smooth shading signal (the reconstruction is
    exact for any locally-linear color field).

    halo_axis: SPMD mesh axis name when the image is row-sharded — the
    up/dn neighbor rows at shard edges are exchanged with the adjacent
    shards (_halo_rows) so the sharded frame is IDENTICAL to the
    single-device one (tests/test_parallel.py asserts it)."""
    par0 = rowpar == 0
    # the complement lattice's own ids (the pixels being reconstructed)
    tri_u = jnp.where(par0, tri_full[:, 1::2], tri_full[:, 0::2])
    cov_u = tri_u != NO_TRIANGLE

    halos = {}
    for name, arr in (("tri", tri_s), ("cov", cov_s), ("col", shaded)):
        halos[name] = _halo_rows(arr, halo_axis)

    def up(a, key):  # neighbor (y-1, x): same packed column, previous row
        return jnp.concatenate([halos[key][0], a[..., :-1, :]], axis=-2)

    def dn(a, key):
        return jnp.concatenate([a[..., 1:, :], halos[key][1]], axis=-2)

    def left(a, key=None):  # (y, x-1): packed j on parity-0 rows, j-1 on parity-1
        jm1 = jnp.concatenate([a[..., :, :1], a[..., :, :-1]], axis=-1)
        return jnp.where(par0, a, jm1)

    def right(a, key=None):
        jp1 = jnp.concatenate([a[..., :, 1:], a[..., :, -1:]], axis=-1)
        return jnp.where(par0, jp1, a)

    num = jnp.zeros_like(shaded)
    den = jnp.zeros(tri_u.shape, jnp.float32)
    numc = jnp.zeros_like(shaded)
    denc = jnp.zeros(tri_u.shape, jnp.float32)
    nb_min = jnp.full_like(shaded, jnp.inf)
    nb_max = jnp.full_like(shaded, -jnp.inf)
    for sh in (up, dn, left, right):
        nb_t = sh(tri_s, "tri")
        nb_cov = sh(cov_s, "cov")
        nb_c = sh(shaded, "col")
        w_same = ((nb_t == tri_u) & nb_cov).astype(jnp.float32)
        num = num + nb_c * w_same[None]
        den = den + w_same
        numc = numc + nb_c * nb_cov.astype(jnp.float32)[None]
        denc = denc + nb_cov.astype(jnp.float32)
        same = w_same != 0.0
        nb_min = jnp.where(same[None], jnp.minimum(nb_min, nb_c), nb_min)
        nb_max = jnp.where(same[None], jnp.maximum(nb_max, nb_c), nb_max)
    # den == 4: per-channel TRIMMED mean (drop min and max). Exact for every
    # linear color field — the four cardinal neighbors of a lattice point
    # come in symmetric pairs (c±dx, c±dy), so the middle two always sum to
    # 2c — while a single-neighbor specular spike (the dominant checkerboard
    # error: unclamped GGX highlights) no longer leaks into the pixel.
    # den < 4 keeps the plain same-triangle mean.
    trimmed = (num - nb_min - nb_max) * 0.5
    mean = num / jnp.maximum(den, 1.0)[None]
    recon = jnp.where(
        (den > 0)[None],
        jnp.where((den == 4.0)[None], trimmed, mean),
        jnp.where((denc > 0)[None], numc / jnp.maximum(denc, 1.0)[None], bg),
    )
    recon = jnp.where(cov_u[None], recon, bg)
    # suspect score for the edge fix (_checkerboard_fix): covered pixels
    # ranked by same-triangle neighbor color spread — reconstruction is
    # exact for linear fields, so a large spread marks the curvature /
    # different-surface-point cases that actually err; den == 0 (covered
    # but no same-triangle neighbor: sub-pixel slivers) is always suspect
    spread = jnp.where(
        (den > 0)[None], nb_max - nb_min, 0.0
    ).sum(axis=0)
    score = jnp.where(
        cov_u, jnp.where(den == 0.0, jnp.float32(1e9), spread),
        jnp.float32(-1.0),
    )
    # interleave the two half-lattices back to full width with
    # interior-padded lax.pads — a stack-to-(H, W/2, 2) would pad its
    # minor dim 2 -> 128 physically (PERF.md layout law)
    return recon, score, tri_u


def _cb_interleave(shaded, recon, rowpar):
    """(3, H, W/2) shaded + reconstructed half-lattices -> (3, H, W).

    Interleave with interior-padded lax.pads — a stack-to-(H, W/2, 2)
    would pad its minor dim 2 -> 128 physically (PERF.md layout law)."""
    par0 = rowpar == 0
    even = jnp.where(par0, shaded, recon)
    odd = jnp.where(par0, recon, shaded)
    zero = jnp.float32(0)
    return jax.lax.pad(
        even, zero, ((0, 0, 0), (0, 0, 0), (0, 1, 1))
    ) + jax.lax.pad(odd, zero, ((0, 0, 0), (0, 0, 0), (1, 0, 1)))


QFIX_K_DIV = 8  # quarter-fix capacity divisor: K = P/8 suspects (3/4 of the
                # frame is reconstructed, vs 1/2 for checkerboard)


def _interleave_last(a, b):
    """Columns interleave: (..., W/2) a at even, b at odd -> (..., W)."""
    zero = jnp.float32(0)
    pads = ((0, 0, 0),) * (a.ndim - 1)
    return jax.lax.pad(a, zero, pads + ((0, 1, 1),)) + jax.lax.pad(
        b, zero, pads + ((1, 0, 1),)
    )


def _interleave_rows(a, b):
    """Row interleave: (..., H/2, W) a at even rows, b at odd -> (..., H, W)."""
    zero = jnp.float32(0)
    pads = ((0, 0, 0),) * (a.ndim - 2)
    return jax.lax.pad(a, zero, pads + ((0, 1, 1), (0, 0, 0))) + jax.lax.pad(
        b, zero, pads + ((1, 0, 1), (0, 0, 0))
    )


def _quarter_expand(shaded, tri_full, tri_s, cov_s, bg, halo_axis=None):
    """(3, H/2, W/2) shaded quarter lattice -> ((3, H, W) frame,
    (3, H/2, W/2) per-class suspect scores).

    Shaded samples sit at (even x, even y). The three complement classes
    reconstruct from their shaded neighbors, same-triangle masked exactly
    like the checkerboard tier (_checkerboard_expand):
    - H (odd x, even y): left/right shaded (lattice j, j+1) — the 2-mean
      is exact for linear color fields;
    - V (even x, odd y): up/down shaded (lattice i, i+1);
    - D (odd x, odd y): the four diagonal shaded samples; trimmed mean
      when all four share the triangle (symmetric pairs -> exact linear,
      single-neighbor specular spikes dropped).
    Fallback covered-neighbor mean, exact background on uncovered pixels.
    Scores rank same-triangle neighbor color spread per class (den==0
    covered slivers forced suspect) for _quarter_fix.

    halo_axis: SPMD row sharding — V/D classes read lattice row i+1,
    which crosses the shard edge on the last row; ONE ppermute
    (_halo_rows' below row) makes sharded == single-device."""
    tri_h = tri_full[0::2, 1::2]
    tri_v = tri_full[1::2, 0::2]
    tri_d = tri_full[1::2, 1::2]

    below = {
        name: _halo_rows(arr, halo_axis)[1]
        for name, arr in (("tri", tri_s), ("cov", cov_s), ("col", shaded))
    }

    def right(a, key=None):
        return jnp.concatenate([a[..., :, 1:], a[..., :, -1:]], axis=-1)

    def down(a, key):
        return jnp.concatenate([a[..., 1:, :], below[key]], axis=-2)

    def down_right(a, key):
        # the appended halo row must be column-shifted too
        return jnp.concatenate(
            [right(a)[..., 1:, :], right(below[key])], axis=-2
        )

    ident = lambda a, key=None: a
    classes = (
        (tri_h, (ident, right)),
        (tri_v, (ident, down)),
        (tri_d, (ident, right, down, down_right)),
    )
    recons, scores = [], []
    for tri_u, nbs in classes:
        cov_u = tri_u != NO_TRIANGLE
        num = jnp.zeros_like(shaded)
        den = jnp.zeros(tri_u.shape, jnp.float32)
        numc = jnp.zeros_like(shaded)
        denc = jnp.zeros(tri_u.shape, jnp.float32)
        nb_min = jnp.full_like(shaded, jnp.inf)
        nb_max = jnp.full_like(shaded, -jnp.inf)
        for sh in nbs:
            nb_t = sh(tri_s, "tri")
            nb_cov = sh(cov_s, "cov")
            nb_c = sh(shaded, "col")
            w_same = ((nb_t == tri_u) & nb_cov).astype(jnp.float32)
            num = num + nb_c * w_same[None]
            den = den + w_same
            numc = numc + nb_c * nb_cov.astype(jnp.float32)[None]
            denc = denc + nb_cov.astype(jnp.float32)
            same = w_same != 0.0
            nb_min = jnp.where(same[None], jnp.minimum(nb_min, nb_c), nb_min)
            nb_max = jnp.where(same[None], jnp.maximum(nb_max, nb_c), nb_max)
        mean = num / jnp.maximum(den, 1.0)[None]
        if len(nbs) == 4:  # D class: trimmed mean when all 4 agree
            trimmed = (num - nb_min - nb_max) * 0.5
            mean = jnp.where((den == 4.0)[None], trimmed, mean)
        recon = jnp.where(
            (den > 0)[None],
            mean,
            jnp.where(
                (denc > 0)[None], numc / jnp.maximum(denc, 1.0)[None], bg
            ),
        )
        recons.append(jnp.where(cov_u[None], recon, bg))
        spread = jnp.where((den > 0)[None], nb_max - nb_min, 0.0).sum(axis=0)
        scores.append(
            jnp.where(
                cov_u,
                jnp.where(den == 0.0, jnp.float32(1e9), spread),
                jnp.float32(-1.0),
            )
        )
    even_rows = _interleave_last(shaded, recons[0])   # (3, H/2, W)
    odd_rows = _interleave_last(recons[1], recons[2])
    frame = _interleave_rows(even_rows, odd_rows)     # (3, H, W)
    return frame, jnp.stack(scores)


def _quarter_fix(color, scores, vis, y0, run, bary_from_records):
    """Exactly re-shade the worst quarter-reconstructed pixels (sparse).

    Same structure as _checkerboard_fix: approx-top-k over the
    concatenated per-class spread scores picks up to K = max(2048, P/8)
    suspects across ALL three complement classes at once — the per-pixel
    budget allocates itself to whichever class errs (the adaptive half of
    the VRS tier) — re-shades them through the SAME shading closure on an
    (8, K/8) batch, and scatters into the interleaved frame."""
    _, h2, w2 = scores.shape
    p_u = h2 * w2
    fh_, fw_ = vis.depth.shape
    p_full = fh_ * fw_
    k = min(3 * p_u - (3 * p_u) % 8,
            max(2048, -(-p_full // QFIX_K_DIV) // 8 * 8))
    vals, idx = jax.lax.approx_max_k(
        scores.reshape(3 * p_u), k, recall_target=0.95
    )
    idx, vals = jax.lax.sort((idx, vals), dimension=0, num_keys=1)
    good = vals > FIX_TAU
    cls = idx // p_u
    rem = idx % p_u
    ii = rem // w2
    jj = rem % w2
    # class -> pixel coords: H (cls 0) = (2j+1, 2i); V = (2j, 2i+1);
    # D = (2j+1, 2i+1)
    xx = 2 * jj + (cls != 1).astype(jnp.int32)
    yy = 2 * ii + (cls != 0).astype(jnp.int32)
    flat_pix = yy * fw_ + xx
    d_k = vis.depth.reshape(p_full)[flat_pix]
    t_k = jnp.where(good, vis.tri_id.reshape(p_full)[flat_pix], NO_TRIANGLE)
    px_k = xx.astype(jnp.float32) + 0.5
    py_k = yy.astype(jnp.float32) + jnp.asarray(y0, jnp.float32) + 0.5
    shape2 = (8, k // 8)
    bary_k = None
    if not bary_from_records:
        bary_k = vis.bary.reshape(3, p_full)[:, flat_pix].reshape((3,) + shape2)
    color_k = run(
        d_k.reshape(shape2), t_k.reshape(shape2),
        px_k.reshape(shape2), py_k.reshape(shape2), bary_k,
    ).reshape(3, k)
    flat = jnp.where(good, flat_pix, p_full)  # OOB = drop
    out = color.reshape(3, p_full).at[:, flat].set(
        color_k, mode="drop", unique_indices=True
    )
    return out.reshape(color.shape)

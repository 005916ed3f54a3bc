"""The flagship render pipeline as a declared frame graph.

Mirrors the reference's pass chain (SURVEY.md §3.2): coarse cull ->
GPU-driven triangle cull -> raster -> shade, with the runtime switches of
RuntimeConfiguration (ecs.rs:240-277): freeze_culling (persistent soup, no
bypass copy needed), debug_aabbs (AABB box soup replaces scene geometry).
Depth prepass / shadow / PBR passes extend this graph in later stages.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from renderer_tpu.graph import FrameGraph
from renderer_tpu.graph.core import PlanCache
from renderer_tpu.ops import debug as dbg
from renderer_tpu.ops import geometry, shading
from renderer_tpu.ops.cull import compact_soup
from renderer_tpu.ops.geometry import TriangleSoup
from renderer_tpu.ops.raster_jax import rasterize


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    width: int = 256
    height: int = 256
    tri_capacity: int = 16384
    cull_backface: bool = True
    background: tuple = (0.05, 0.05, 0.08)
    shading: str = "pbr"  # "pbr" (GGX metallic-roughness) | "lambert"
    # use the Pallas tile rasterizer (needs width%128==0, height%16==0,
    # tri_capacity%256==0); False falls back to the plain-XLA rasterizer
    use_pallas: bool = False
    pallas_interpret: bool = False  # CPU-mesh tests / dryruns

    def __post_init__(self):
        assert self.tri_capacity % 128 == 0, "tri_capacity must be 128-aligned"
        if self.use_pallas:
            assert self.width % 128 == 0 and self.height % 16 == 0, (
                "pallas raster needs width%128==0, height%16==0"
            )
            assert self.tri_capacity % 256 == 0


def empty_soup(capacity: int) -> TriangleSoup:
    return TriangleSoup(
        clip=jnp.zeros((capacity, 3, 4), jnp.float32),
        world=jnp.zeros((capacity, 3, 3), jnp.float32),
        normal=jnp.zeros((capacity, 3, 3), jnp.float32),
        uv=jnp.zeros((capacity, 3, 2), jnp.float32),
        tangent=jnp.zeros((capacity, 3, 4), jnp.float32),
        instance=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        count=jnp.zeros((), jnp.int32),
        tex_lod=jnp.zeros((capacity,), jnp.float32),
    )


def build_forward_graph(cfg: PipelineConfig) -> FrameGraph:
    g = FrameGraph("forward")
    g.switch("freeze_culling", "debug_aabbs")

    g.resource("scene", external=True, desc="Scene pytree (SoA)")
    g.resource("camera", external=True, desc="Camera")
    g.resource("prepared", desc="(model, viewproj, clip_mats, visible, lod)")
    g.resource(
        "soup",
        persistent=True,
        init=lambda: empty_soup(cfg.tri_capacity),
        desc="post-cull triangle stream",
    )
    g.resource("vis", desc="visibility buffer (depth, tri_id, bary)")
    g.resource("image", desc="linear RGB framebuffer")

    @g.pass_("prepare", reads=["scene", "camera"], writes=["prepared"])
    def prepare(scene, camera):
        model = geometry.instance_matrices(scene)
        vp, clip_mats = geometry.camera_clip_matrices(camera, model)
        visible = geometry.coarse_cull(scene, model, vp)
        lod = geometry.select_lod(scene, camera, model)
        return {"prepared": (model, vp, clip_mats, visible, lod)}

    @g.pass_(
        "cull",
        reads=["scene", "prepared"],
        writes=["soup"],
        condition=["!freeze_culling", "!debug_aabbs"],
        queue="compute",
    )
    def cull(scene, prepared):
        model, vp, clip_mats, visible, lod = prepared
        soup = geometry.expand_draw_stream(
            scene, visible, lod, clip_mats, model, cfg.tri_capacity
        )
        soup = geometry.cull_triangles(soup, cull_backface=cfg.cull_backface)
        soup = compact_soup(soup)
        soup = geometry.finalize_tex_lod(
            soup, cfg.width, cfg.height, scene.atlas.level_size[0]
        )
        return {"soup": soup}

    @g.pass_(
        "aabb_soup",
        reads=["scene", "prepared"],
        writes=["soup"],
        condition="debug_aabbs",
        queue="compute",
    )
    def aabb(scene, prepared):
        model, vp, clip_mats, visible, lod = prepared
        soup = dbg.aabb_soup(scene, visible, clip_mats, model, cfg.tri_capacity)
        return {"soup": compact_soup(soup)}

    @g.pass_("raster", reads=["soup"], writes=["vis"])
    def raster(soup):
        if cfg.use_pallas:
            from renderer_tpu.ops.raster_pallas import rasterize_pallas

            vis = rasterize_pallas(
                soup.clip,
                soup.valid,
                cfg.width,
                cfg.height,
                cull_backface=cfg.cull_backface,
                interpret=cfg.pallas_interpret,
            )
        else:
            vis = rasterize(
                soup.clip,
                soup.valid,
                cfg.width,
                cfg.height,
                cull_backface=cfg.cull_backface,
                count=soup.count,
            )
        return {"vis": vis}

    @g.pass_(
        "shade",
        reads=["vis", "soup", "scene", "camera"],
        writes=["image"],
        condition="!debug_aabbs",
    )
    def shade(vis, soup, scene, camera):
        if cfg.shading == "pbr":
            from renderer_tpu.ops.pbr import shade_pbr

            img = shade_pbr(
                vis, soup, scene, camera.position, background=cfg.background
            )
        else:
            img = shading.shade_lambert(
                vis, soup, scene, camera.position, background=cfg.background
            )
        return {"image": img}

    @g.pass_(
        "shade_debug",
        reads=["vis", "soup"],
        writes=["image"],
        condition="debug_aabbs",
    )
    def shade_debug(vis, soup):
        return {"image": shading.shade_flat_instance(vis, soup, background=cfg.background)}

    return g


def forward_plan_cache(cfg: PipelineConfig) -> PlanCache:
    return PlanCache(build_forward_graph(cfg), outputs=["image", "vis"])

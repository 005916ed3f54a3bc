"""Async scene streaming: decode on host threads, upload on a frame budget.

The reference streams glTF scenes with bevy task pools: parse/decode tasks
off-thread, then `upload_loaded_meshes` integrates at most 8 meshes per frame
into the consolidated buffers (scene_loader.rs:102-613, budget at :166).

TPU equivalent: decode (glTF parse, normal generation, texture resize) runs
in a ThreadPoolExecutor; staging bytes live in the native arena
(runtime/allocator.py) so repeated uploads reuse pinned host memory; `pump()`
integrates up to `budget` decoded meshes per frame into the device Scene
pytree through ONE pre-compiled donated upload program (dynamic_update_slice
at traced offsets — no per-mesh recompiles).
"""

from __future__ import annotations

import functools
from concurrent.futures import Future, ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from renderer_tpu.scene.builder import HostMesh
from renderer_tpu.scene.types import Scene

# streamed meshes are uploaded in fixed-size chunks so one compiled program
# serves every upload (ref: fixed staging buffer sizes)
CHUNK_VERTS = 4096
CHUNK_TRIS = 8192


@functools.partial(jax.jit, donate_argnums=0)
def _upload_chunk(
    scene: Scene,
    pos, nrm, uv, tan,  # (CHUNK_VERTS, ...) padded
    idx,  # (CHUNK_TRIS, 3) library-global, padded
    v_off, v_count, t_off, t_count,
    mesh_slot, lod_offsets, lod_counts, aabb_min, aabb_max,
    bump_counts,  # bool scalar: final chunk writes the directory
):
    lib = scene.meshes
    du = jax.lax.dynamic_update_slice
    new = lib._replace(
        positions=du(lib.positions, pos, (v_off, 0)),
        normals=du(lib.normals, nrm, (v_off, 0)),
        uvs=du(lib.uvs, uv, (v_off, 0)),
        tangents=du(lib.tangents, tan, (v_off, 0)),
        indices=du(lib.indices, idx, (t_off, 0)),
    )

    def finalize(lib2):
        m = mesh_slot
        return lib2._replace(
            mesh_vertex_offset=lib2.mesh_vertex_offset.at[m].set(v_off),
            mesh_vertex_count=lib2.mesh_vertex_count.at[m].set(v_count),
            lod_index_offset=lib2.lod_index_offset.at[m].set(lod_offsets),
            lod_tri_count=lib2.lod_tri_count.at[m].set(lod_counts),
            mesh_aabb_min=lib2.mesh_aabb_min.at[m].set(aabb_min),
            mesh_aabb_max=lib2.mesh_aabb_max.at[m].set(aabb_max),
            vertex_count=jnp.maximum(lib2.vertex_count, v_off + v_count),
            tri_count=jnp.maximum(lib2.tri_count, t_off + t_count),
            mesh_count=jnp.maximum(lib2.mesh_count, m + 1),
        )

    new = jax.lax.cond(bump_counts, finalize, lambda x: x, new)
    return scene._replace(meshes=new)


@functools.partial(jax.jit, donate_argnums=0)
def _spawn_instance(scene: Scene, slot, mesh_id, material_id, translation, rotation, scale):
    inst = scene.instances
    return scene._replace(
        instances=inst._replace(
            translation=inst.translation.at[slot].set(translation),
            rotation=inst.rotation.at[slot].set(rotation),
            scale=inst.scale.at[slot].set(scale),
            mesh_id=inst.mesh_id.at[slot].set(mesh_id),
            material_id=inst.material_id.at[slot].set(material_id),
            alive=inst.alive.at[slot].set(True),
            count=jnp.maximum(inst.count, slot + 1),
        )
    )


class SceneStreamer:
    """Streams meshes into a live Scene with a per-frame upload budget."""

    def __init__(self, scene: Scene, budget: int = 8, workers: int = 2, arena=None):
        self.scene = scene
        self.budget = budget  # ref: <=8 mesh uploads per frame
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._pending: list[Future] = []
        self._ready: list[tuple] = []
        self._v_off = int(scene.meshes.vertex_count)
        self._t_off = int(scene.meshes.tri_count)
        self._mesh_slot = int(scene.meshes.mesh_count)
        self._inst_slot = int(scene.instances.count)
        self.arena = arena
        self.stats = {"requested": 0, "decoded": 0, "uploaded": 0, "frames": 0}

    # -- producers ----------------------------------------------------------
    def request_mesh(self, source, material_id=0, translation=(0, 0, 0),
                     rotation=(1, 0, 0, 0), scale=1.0) -> None:
        """source: HostMesh, a path to .glb/.gltf, or a zero-arg callable
        returning HostMesh. Decode happens off-thread."""
        self.stats["requested"] += 1

        def decode():
            if isinstance(source, HostMesh):
                mesh = source
            elif callable(source):
                mesh = source()
            else:
                from renderer_tpu.scene import SceneBuilder, SceneLimits
                from renderer_tpu.scene.gltf import load_gltf

                b = load_gltf(str(source), SceneBuilder(SceneLimits.tiny()))
                mesh = b._meshes[0]
            # stage through the arena when available (pinned reuse)
            if self.arena is not None:
                staged = self.arena.alloc(mesh.positions.shape, np.float32)
                staged[:] = mesh.positions
                mesh.positions = staged.copy()
                self.arena.free(staged)
            return (mesh, material_id, translation, rotation, scale)

        self._pending.append(self._pool.submit(decode))

    # -- per-frame integration ----------------------------------------------
    def pump(self) -> Scene:
        """Integrate up to `budget` decoded meshes; returns the live scene."""
        self.stats["frames"] += 1
        still = []
        for f in self._pending:
            if f.done():
                self._ready.append(f.result())
                self.stats["decoded"] += 1
            else:
                still.append(f)
        self._pending = still

        for _ in range(min(self.budget, len(self._ready))):
            item = self._ready.pop(0)
            if item[0] == "texture":
                _, layer, words = item
                self._upload_texture(layer, words)
            else:
                mesh, mat, t, r, s = item
                self._upload(mesh, mat, t, r, s)
            self.stats["uploaded"] += 1
        return self.scene

    @staticmethod
    def _chunk_for(n, cap_left, biggest):
        """Smallest power-of-two tier >= n that still fits in cap_left.
        A handful of tiers keeps the set of compiled upload programs small;
        exact-fit updates avoid dynamic_update_slice's silent clamping."""
        for c in (256, 1024, biggest):
            if n <= c <= cap_left:
                return c
        return None

    def _upload(self, mesh: HostMesh, material_id, translation, rotation, scale):
        v = len(mesh.positions)
        tcnt = len(mesh.indices)
        lib = self.scene.meshes
        if v > CHUNK_VERTS or tcnt > CHUNK_TRIS:
            raise ValueError(
                f"streamed mesh too large ({v} verts / {tcnt} tris; chunked "
                "streaming of larger meshes is a later milestone)"
            )
        chunk_v = self._chunk_for(v, lib.positions.shape[0] - self._v_off, CHUNK_VERTS)
        chunk_t = self._chunk_for(tcnt, lib.indices.shape[0] - self._t_off, CHUNK_TRIS)
        if chunk_v is None or chunk_t is None:
            raise MemoryError("mesh library capacity exhausted during streaming")

        def pad(a, n, shape_tail):
            out = np.zeros((n,) + shape_tail, a.dtype)
            out[: len(a)] = a
            return out

        l = lib.lod_index_offset.shape[1]
        lod_off = np.full((l,), self._t_off, np.int32)
        lod_cnt = np.full((l,), tcnt, np.int32)
        self.scene = _upload_chunk(
            self.scene,
            jnp.asarray(pad(mesh.positions, chunk_v, (3,))),
            jnp.asarray(pad(mesh.normals, chunk_v, (3,))),
            jnp.asarray(pad(mesh.uvs, chunk_v, (2,))),
            jnp.asarray(pad(mesh.tangents, chunk_v, (4,))),
            jnp.asarray(pad(mesh.indices.astype(np.int32) + self._v_off, chunk_t, (3,))),
            jnp.int32(self._v_off), jnp.int32(v),
            jnp.int32(self._t_off), jnp.int32(tcnt),
            jnp.int32(self._mesh_slot),
            jnp.asarray(lod_off), jnp.asarray(lod_cnt),
            jnp.asarray(mesh.positions.min(axis=0)),
            jnp.asarray(mesh.positions.max(axis=0)),
            jnp.bool_(True),
        )
        self.scene = _spawn_instance(
            self.scene,
            jnp.int32(self._inst_slot),
            jnp.int32(self._mesh_slot),
            jnp.int32(material_id),
            jnp.asarray(translation, jnp.float32),
            jnp.asarray(rotation, jnp.float32),
            jnp.float32(scale),
        )
        self._v_off += v
        self._t_off += tcnt
        self._mesh_slot += 1
        self._inst_slot += 1

    # -- texture streaming -----------------------------------------------
    def request_texture(self, img) -> int:
        """Queue a texture for upload into a preallocated atlas layer (the
        scene must have been built with SceneBuilder(..).build/preallocated
        atlas slots). Returns the layer id to use in materials NOW — the
        slot shows white until the upload lands."""
        atlas = self.scene.atlas
        n_total = atlas.packed_u32.shape[0]
        # layer capacity from shapes: total = n_layers * sum(s_l^2)
        import numpy as np

        sizes = np.asarray(atlas.level_size)
        per_layer = int((sizes.astype(np.int64) ** 2).sum())
        n_layers = n_total // per_layer
        if not hasattr(self, "_next_tex_layer"):
            self._next_tex_layer = int(np.asarray(atlas.n_layers))
        layer = self._next_tex_layer
        if layer >= n_layers:
            raise MemoryError("atlas layer slots exhausted during streaming")
        self._next_tex_layer += 1
        self.stats["requested"] += 1

        def decode():
            from renderer_tpu.scene.textures import build_mips

            arr = np.asarray(img)
            if arr.dtype != np.uint8:
                arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
            if arr.shape[-1] == 3:
                arr = np.concatenate(
                    [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=-1
                )
            size = int(sizes[0])
            if arr.shape[:2] != (size, size):
                from PIL import Image

                arr = np.asarray(Image.fromarray(arr).resize((size, size), Image.BILINEAR))
            mips = build_mips(arr)
            words = []
            for m in mips:
                p = m.reshape(-1, 4).astype(np.uint32)
                words.append(p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24))
            return ("texture", layer, words)

        self._pending.append(self._pool.submit(decode))
        return layer

    def _upload_texture(self, layer: int, words: list) -> None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        atlas = self.scene.atlas
        offs = np.asarray(atlas.level_offset)
        sizes = np.asarray(atlas.level_size)
        packed = atlas.packed_u32
        for l, w in enumerate(words):
            s2 = int(sizes[l]) ** 2
            start = int(offs[l]) + layer * s2
            packed = jax.lax.dynamic_update_slice(
                packed, jnp.asarray(w, jnp.uint32), (start,)
            )
        self.scene = self.scene._replace(atlas=atlas._replace(packed_u32=packed))

    def close(self):
        self._pool.shutdown(wait=False)

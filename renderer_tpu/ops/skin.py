"""Linear-blend skinning + keyframe animation (the CesiumMan capability).

GPU engines skin in the vertex shader from a per-frame joint palette; here a
"pose" pass samples every skin's clip, builds joint palettes (world @
inverse_bind), and rewrites the consolidated vertex pool's positions/normals
— compute-skinning into the vertex buffer, one batched LBS matmul for all
skinned vertices. Downstream passes are oblivious to skinning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderer_tpu.mathx.transforms import trs_matrix
from renderer_tpu.scene.types import Scene, Skins


def sample_clips(skins: Skins, time) -> jnp.ndarray:
    """Sample every skin's clip at `time` (looping) -> joint palettes
    (S, J, 4, 4) = world_joint @ inverse_bind."""
    s_cap, k_cap = skins.key_times.shape
    j_cap = skins.parents.shape[1]
    t = jnp.asarray(time, jnp.float32)
    tt = jnp.where(skins.duration > 0, jnp.mod(t, skins.duration), 0.0)  # (S,)

    # keyframe bracket per skin
    def bracket(times, tval, count):
        hi = jnp.clip(jnp.searchsorted(times, tval, side="right"), 1, jnp.maximum(count - 1, 1))
        lo = hi - 1
        t0 = times[lo]
        t1 = times[hi]
        f = jnp.where(t1 > t0, (tval - t0) / (t1 - t0), 0.0)
        return lo, hi, jnp.clip(f, 0.0, 1.0)

    lo, hi, f = jax.vmap(bracket)(skins.key_times, tt, skins.key_count)  # (S,)

    def take(arr, idx):  # arr (S, K, ...) -> (S, ...)
        return jax.vmap(lambda a, i: a[i])(arr, idx)

    t0, t1 = take(skins.key_t, lo), take(skins.key_t, hi)  # (S, J, 3)
    r0, r1 = take(skins.key_r, lo), take(skins.key_r, hi)  # (S, J, 4)
    s0, s1 = take(skins.key_s, lo), take(skins.key_s, hi)  # (S, J)
    fk = f[:, None, None]
    trans = t0 + (t1 - t0) * fk
    # nlerp with hemisphere correction (shortest path)
    dot = jnp.sum(r0 * r1, axis=-1, keepdims=True)
    r1 = jnp.where(dot < 0, -r1, r1)
    rot = r0 + (r1 - r0) * fk
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-8)
    scale = s0 + (s1 - s0) * f[:, None]

    local = trs_matrix(trans, rot, scale)  # (S, J, 4, 4)

    # world = parent chain (parents are topologically ordered)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (s_cap, 4, 4))

    def body(j, worlds):
        p = skins.parents[:, j]  # (S,)
        parent_m = jnp.where(
            (p >= 0)[:, None, None],
            jnp.take_along_axis(
                worlds, jnp.clip(p, 0)[:, None, None, None].repeat(4, 2).repeat(4, 3),
                axis=1,
            )[:, 0],
            eye,
        )
        wj = jnp.einsum("sij,sjk->sik", parent_m, local[:, j], precision="highest")
        return worlds.at[:, j].set(wj)

    worlds = jax.lax.fori_loop(
        0, j_cap, body, jnp.broadcast_to(eye[:, None], (s_cap, j_cap, 4, 4))
    )
    return jnp.einsum("sjik,sjkl->sjil", worlds, skins.inverse_bind, precision="highest")


def pose_scene(scene: Scene, time) -> Scene:
    """Return the scene with skinned vertices posed at `time` (LBS on the
    consolidated pool; rigid vertices pass through untouched)."""
    skins = scene.skins
    palettes = sample_clips(skins, time)  # (S, J, 4, 4)
    s_cap, j_cap = palettes.shape[:2]
    flat = palettes.reshape(s_cap * j_cap, 4, 4)

    # per-vertex skin id from weights: rigid vertices have all-zero weights
    wsum = jnp.sum(skins.weights, axis=-1)  # (V,)
    skinned = wsum > 1e-6
    vskin = skins.vertex_skin  # (V,) skin id per vertex, -1 = rigid

    safe_skin = jnp.maximum(vskin, 0)
    jidx = safe_skin[:, None] * j_cap + jnp.clip(skins.joints, 0, j_cap - 1)  # (V, 4)
    mats = flat[jidx]  # (V, 4, 4, 4)
    blend = jnp.einsum("vk,vkij->vij", skins.weights, mats, precision="highest")

    pos = scene.meshes.positions
    h = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1), jnp.float32)], axis=-1)
    posed = jnp.einsum("vij,vj->vi", blend, h, precision="highest")[:, :3]
    nrm = scene.meshes.normals
    posed_n = jnp.einsum("vij,vj->vi", blend[:, :3, :3], nrm, precision="highest")
    posed_n = posed_n / jnp.maximum(jnp.linalg.norm(posed_n, axis=-1, keepdims=True), 1e-8)

    use = (skinned & (vskin >= 0))[:, None]
    new_pos = jnp.where(use, posed, pos)
    new_nrm = jnp.where(use, posed_n, nrm)
    # tri_rec caches REST-pose per-triangle attributes; the posed view must
    # not serve stale rows, so drop it (expansion falls back to the
    # gather-per-corner path for skinned views)
    return scene._replace(
        meshes=scene.meshes._replace(
            positions=new_pos, normals=new_nrm, tri_rec=None
        )
    )

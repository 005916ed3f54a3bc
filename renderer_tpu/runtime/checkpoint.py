"""Checkpoint / resume for scenes and renderer state.

The reference has no runtime checkpointing (SURVEY.md §5 — only the build
cache). Here every piece of state is a pytree of arrays, so save/resume is a
flat .npz round-trip: scenes (streamed-in content included), the renderer's
persistent resources (draw list, previous-frame visibility), and the runtime
config.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree) -> None:
    leaves, _ = _flatten(tree)
    np.savez_compressed(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree(path: str, like):
    """Load into the structure of `like` (shapes/dtypes must match)."""
    data = np.load(path)
    leaves, treedef = _flatten(like)
    new = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(ref)):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {np.shape(ref)}"
            )
        ref_dtype = np.asarray(ref).dtype if not hasattr(ref, "dtype") else ref.dtype
        if arr.dtype != ref_dtype:
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != expected {ref_dtype}"
            )
        new.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new)


def save_renderer(path_prefix: str, renderer) -> None:
    """Write <prefix>.scene.npz, <prefix>.state.npz, <prefix>.meta.json."""
    import dataclasses

    save_pytree(path_prefix + ".scene.npz", renderer.scene)
    save_pytree(path_prefix + ".state.npz", renderer.state)
    with open(path_prefix + ".meta.json", "w") as f:
        json.dump(
            {
                "frame_number": renderer.frame_number,
                "config": dataclasses.asdict(renderer.config),
            },
            f,
        )


def load_renderer(path_prefix: str, renderer) -> None:
    """Restore scene/state/config into an existing, compatible Renderer."""
    import dataclasses

    renderer.scene = load_pytree(path_prefix + ".scene.npz", renderer.scene)
    renderer.state = load_pytree(path_prefix + ".state.npz", renderer.state)
    with open(path_prefix + ".meta.json") as f:
        meta = json.load(f)
    renderer.frame_number = meta["frame_number"]
    renderer.config = dataclasses.replace(renderer.config, **meta["config"])
    renderer._pending_config = dataclasses.replace(renderer.config)

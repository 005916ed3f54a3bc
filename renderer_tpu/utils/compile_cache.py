"""Cross-process XLA compilation cache.

The reference's build-time "crossbar" persists frame-graph analysis across
builds (/root/reference/macro_lib/macrolib.rs:505-518) so edits don't pay
full re-analysis. The TPU analogue of that compile cost is XLA compilation —
20-40s for the full 1080p frame program — so we enable jax's persistent
compilation cache: the second process start deserializes the compiled
executable instead of recompiling.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently point jax at an on-disk compilation cache and lower the
    persistence thresholds so frame-sized programs always qualify."""
    global _enabled
    import jax

    d = (
        cache_dir
        or os.environ.get("RENDERER_TPU_COMPILE_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "renderer_tpu", "xla")
    )
    if _enabled:
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    # persist anything that took >=0.5s to compile (default 1s min is fine
    # too, but tiny upload programs recompile often enough to matter)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax: option names not present
        pass
    _enabled = True
    return d

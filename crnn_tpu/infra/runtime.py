"""Runtime setup helpers: compilation cache, dtype policy, device info."""

from __future__ import annotations

import os

import jax

_CACHE_INITIALISED = False


def setup_cache(path: str = None) -> None:
    """Enable the persistent compilation cache (compiles here are remote and
    slow — caching across processes matters for the case runners/bench)."""
    # optional platform override (e.g. CRNN_TPU_PLATFORM=cpu to develop on
    # CPU while a TPU job runs; the axon plugin ignores JAX_PLATFORMS)
    platform = os.environ.get("CRNN_TPU_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
    # (true-f32 matmul precision is forced once at package import —
    # crnn_tpu/__init__.py — which necessarily ran before this helper)
    global _CACHE_INITIALISED
    if _CACHE_INITIALISED or os.environ.get("CRNN_TPU_NO_CACHE"):
        return
    path = path or os.environ.get(
        "CRNN_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".crnn_tpu_jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    _CACHE_INITIALISED = True


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)

"""Runtime setup helpers: compilation cache, dtype policy, device info."""

from __future__ import annotations

import os
from contextlib import contextmanager

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
    """Enable float64 PROCESS-GLOBALLY.

    The f64 case builds (robertson/cathode/cathode_uq/hychem/robertson_qssa)
    call this because their truth generation and training genuinely run in
    double precision (e.g. rober_crnn.jl:40). The flip is global: everything
    traced afterwards in the same process sees x64 semantics. A caller that
    only *borrows* such a case (bench.py, cross-case scripts) must wrap the
    build-and-use block in :func:`x64_scope` so the flip cannot leak — in
    round 4 a leaked flip sent f64 inputs into an f32 Pallas kernel
    (BENCH_r04 ``eval_fused_error``) and silently changed the precision
    regime of every metric measured after the robertson one.
    """
    jax.config.update("jax_enable_x64", True)


@contextmanager
def x64_scope(enable: bool = True):
    """Snapshot/restore ``jax_enable_x64`` around a block.

    Use around any ``build()`` of an f64 case when the surrounding process
    should stay in its own precision regime. Everything that must run in
    f64 (tracing AND execution of the case's jitted functions) has to
    happen inside the ``with`` block.
    """
    prev = bool(jax.config.jax_enable_x64)
    try:
        if enable:
            jax.config.update("jax_enable_x64", True)
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)

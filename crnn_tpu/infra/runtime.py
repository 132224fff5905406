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


def host_device():
    """The host CPU device.

    Double-precision truth generation belongs here BY DESIGN: TPUs have no
    native f64 (it is double-float emulation), and under the axon tunnel
    f64 dispatch can hang outright mid-round (observed round 5: an f64
    ``linspace``→``float()`` that ran at 02:34 blocked forever from 02:53,
    while f32 compute/transfers stayed healthy). Wrap every f64
    data-generation block in ``jax.default_device(host_device())`` so the
    accelerator path stays strictly single-precision.
    """
    return jax.devices("cpu")[0]


@contextmanager
def host_generation():
    """``jax.default_device`` scope pinning array creation to the host CPU.

    Used around the f64 truth-generation blocks of the case builds
    (robertson/cathode/cathode_uq/hychem/robertson_qssa): data is made on
    the host, cast to the training dtype, and only then fed to jitted
    device code (which moves it to the accelerator in working precision).
    """
    with jax.default_device(host_device()):
        yield


def f64_device_ok(timeout_s: float = 60.0) -> bool:
    """Probe (in a SUBPROCESS, so a hang cannot block the caller) whether
    the default JAX device currently executes f64 at all.

    The axon tunnel's f64 support is emulated and has been observed to
    degrade mid-round into an indefinite block; callers that would
    dispatch f64 compute to the device (bench's robertson f64 epoch, f64
    polish stages) must gate on this instead of hanging a capture window.
    """
    import subprocess
    import sys

    code = (
        "import os, jax;"
        "p = os.environ.get('CRNN_TPU_PLATFORM');"
        "p and jax.config.update('jax_platforms', p);"
        "jax.config.update('jax_enable_x64', True);"
        "import jax.numpy as jnp;"
        "x = jnp.linspace(0.0, 1.0, 8).astype(jnp.float64);"
        "print(float((x * x).sum()))"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


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

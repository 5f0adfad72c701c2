"""Persistent XLA compilation cache.

Cold-process compilation of the full generate program costs minutes on TPU
(round-1 driver bench measured 809 s compile+first-run); the reference's
torch stack has no compile step so every second here is a regression a user
feels.  JAX can persist compiled executables keyed by (HLO, compiler version,
platform) — enabling it turns every warm process start into a cache lookup.

Called from every entry point (bench, pipeline, training CLI, examples).
Idempotent; respects an existing user-set ``jax_compilation_cache_dir``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser(
    os.environ.get("PARLER_TTS_TPU_CACHE", "~/.cache/parler_tts_tpu/xla_cache")
)

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    """Turn on JAX's on-disk compilation cache (idempotent).  Returns the
    cache directory in use ('' when skipped).

    Skipped on CPU-pinned processes: CPU compiles are fast, and XLA:CPU AOT
    artifacts are machine-feature-specific (loading them on a different host
    warns about SIGILL risk)."""
    global _enabled
    import jax

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms and set(platforms.split(",")) <= {"cpu"}:
        return ""
    current = jax.config.jax_compilation_cache_dir
    if current:
        _enabled = True
        return current
    cache_dir = os.path.expanduser(path or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program (default threshold skips sub-second compiles, but
    # the decode/prefill programs we care about all take minutes cold)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir

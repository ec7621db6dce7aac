"""Persistent XLA compilation cache setup.

The axon TPU's compile service is slow enough that a cold flagship-step
compile takes minutes; a repo-local persistent cache makes every CLI
entry point (train, inference, bench) reuse compiled executables across
processes. NOTE: this jax install silently ignores the
JAX_COMPILATION_CACHE_DIR environment variable — only the explicit
`jax.config.update` takes effect — which is why this helper exists.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir

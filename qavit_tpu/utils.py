"""Small shared utilities."""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str = ".jax_cache") -> None:
    """Enable JAX's persistent compilation cache (amortises the slow
    remote-compile path across processes/rounds)."""
    import jax

    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(Path(path).resolve()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

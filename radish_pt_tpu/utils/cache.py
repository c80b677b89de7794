"""Persistent XLA compilation cache setup.

First compiles are minutes-long on small hosts (and ~20-40s on TPU); caching
compiled executables on disk makes every subsequent process start fast.
Called from the CLI, bench harness, and test conftest.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get(
        "RADISH_XLA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "radish_pt_tpu", "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

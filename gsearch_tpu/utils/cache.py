"""Persistent XLA compilation cache setup (used by CLI, bench, tests).

In this environment XLA compilation is serviced remotely and can take
seconds to minutes per executable; the on-disk cache amortizes that to one
compile per (program, shape) ever.
"""

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp_cache")
_DONE = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True

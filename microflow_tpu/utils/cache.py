"""Persistent executable cache for the engine's compiled programs.

The flat whole-network Pallas kernel costs minutes of Mosaic+XLA compile
per model; JAX's persistent compilation cache (keyed on the HLO, which
includes the serialized Mosaic kernel) makes any repeat compile of the
same program a disk hit.  This is the TPU analog of the reference
crate's build cache: the macro expansion happens once per `cargo build`
and is reused until the model or code changes.

Opt-in because the cache directory is process-global JAX config.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None, min_compile_secs: float = 10.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``).  Returns the directory used.  Safe to call
    more than once; later calls re-point the cache."""
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path

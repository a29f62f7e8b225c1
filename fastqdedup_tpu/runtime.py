"""JAX runtime configuration (compilation cache, platform probing).

The pipeline compiles a small, bounded family of kernel shapes (tile sizes
and bucket size-classes are padded to powers of two); the persistent
compilation cache makes those compiles a one-time cost per machine instead
of per run.  Disable with ``FASTQDEDUP_JAX_CACHE=0``.
"""

import os

_configured = False


def configure_jax() -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _configured
    if _configured:
        return
    _configured = True
    cache_dir = os.environ.get(
        "FASTQDEDUP_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fastqdedup_tpu",
                     "jax_cache"))
    if cache_dir in ("", "0"):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # Pallas kernels serialize their Mosaic IR (with MLIR locations)
        # into the custom-call payload; full-traceback locations embed the
        # CALLER's source lines, which vary per process/script and change
        # the cache key — every process would recompile (minutes on a
        # remote TPU).  Innermost-frame locations are stable.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - cache is a best-effort speedup
        pass

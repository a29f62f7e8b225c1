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
    except Exception:  # pragma: no cover - cache is a best-effort speedup
        pass

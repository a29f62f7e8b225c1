"""JAX runtime configuration (compilation cache, platform probing).

The pipeline compiles a small, bounded family of kernel shapes (tile sizes
and bucket size-classes are padded to powers of two); the persistent
compilation cache makes those compiles a one-time cost per machine instead
of per run.  Disable with ``FASTQDEDUP_JAX_CACHE=0``.
"""

import os

_configured = False
_allocator_tuned = False


def tune_host_allocator() -> None:
    """Keep freed large buffers in the process heap (idempotent).

    glibc serves big requests via mmap and munmaps them on free, so every
    per-chunk parse/render buffer is brand-new memory whose first touch
    page-faults.  On virtualized hosts with lazy host-side paging those
    faults can cost seconds per GiB (measured here: 2 GiB alloc+fill is
    16 s cold vs 0.4 s from recycled heap pages — 40x).  Raising
    M_MMAP_THRESHOLD and M_TRIM_THRESHOLD makes malloc retain and reuse
    those buffers, paying the fault cost once per buffer size class
    instead of once per chunk.  Peak RSS is unchanged (the retained pages
    are exactly the working set the run already touched); disable with
    ``FASTQDEDUP_MALLOC_TUNE=0``.
    """
    global _allocator_tuned
    if _allocator_tuned or os.environ.get("FASTQDEDUP_MALLOC_TUNE") == "0":
        return
    _allocator_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        threshold = (1 << 31) - (1 << 12)  # mallopt takes int
        libc.mallopt(-3, threshold)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, threshold)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - best-effort, non-glibc hosts
        pass


def configure_jax() -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _configured
    tune_host_allocator()
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

"""JAX runtime configuration (compilation cache, platform probing).

The pipeline compiles a small, bounded family of kernel shapes (tile sizes
and bucket size-classes are padded to powers of two); the persistent
compilation cache makes those compiles a one-time cost per machine instead
of per run.  Disable with ``FASTQDEDUP_JAX_CACHE=0``.
"""

import os

import numpy as np

_configured = False
_allocator_tuned = False

def big_empty(shape, dtype=np.uint8) -> np.ndarray:
    """``np.empty`` for large once-per-run buffers (one tuning point).

    Deliberately plain — two measured dead ends documented so they are
    not retried:

    * Hand-mmapped backing (``np.frombuffer`` over ``mmap``) fails:
      numpy routes ufuncs/``np.take`` writing into foreign-buffer
      destinations through a buffered slow path that is 7-10x slower
      than the owned-memory fast path, warm or cold.  Arrays must OWN
      their memory.
    * madvise(MADV_HUGEPAGE) backing fails: with ``defrag=madvise`` (a
      common default) hugepage faults do synchronous compaction, which
      under page-cache pressure measured 50+ s/GiB.  numpy does this
      madvise ITSELF on every >= 4 MiB allocation — which was the true
      source of the "random" 5-50 s/GiB first-touch costs chased here;
      :func:`tune_host_allocator` now turns it off process-wide.

    With the hugepage madvise off and a 128 MiB M_MMAP_THRESHOLD
    (giants via glibc's own mmap path, numpy owning the pointer),
    plain ``np.empty`` faults at ~1 s/GiB cold."""
    return np.empty(shape, dtype=dtype)


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
        # numpy madvises MADV_HUGEPAGE on every allocation >= 4 MiB.  With
        # THP defrag=madvise (this machine's default) each hugepage fault
        # then does SYNCHRONOUS compaction: a fresh 134 MB np.empty that
        # np.take writes into measured 35-50 s when physical memory is
        # fragmented, vs 1.1 s with the madvise off — and fragmentation
        # builds up over a run, which is why the slowdown looked random.
        # The lost TLB win is noise next to that.  Env override for child
        # processes; the setter for this already-imported process.
        os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
        from numpy._core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - numpy internals may move
        pass
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        # Two regimes, split at 128 MiB:
        #  * below — per-chunk parse/render buffers: recycled through the
        #    heap (huge trim threshold), so their first-touch cost is
        #    paid once per size class, not once per chunk;
        #  * above — one-shot giants (accumulator arena/slots, gathered
        #    tables): served by mmap, whose fresh-page faults measure
        #    ~0.8 s/GiB here versus 5-18 s/GiB for brk-grown heap pages,
        #    and whose realloc growth is an mremap instead of a copy.
        libc.mallopt(-3, 128 << 20)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, (1 << 31) - (1 << 12))  # M_TRIM_THRESHOLD
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

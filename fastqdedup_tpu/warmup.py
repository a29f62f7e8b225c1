"""Pre-compile the canonical device kernels (`python -m
fastqdedup_tpu.warmup`).

Every hot kernel is shape-canonicalized (fixed tiles, padded geometry,
runtime length/distance scalars), so the full set below covers production
runs of any read length <= the listed caps, any alphabet <= 8 symbols, and
any distance.  Cold Mosaic compiles through a remote TPU can take minutes;
running this once per machine moves that cost out of the first real run
(results land in the persistent XLA cache, see fastqdedup_tpu.runtime).
"""

import sys
import time

import numpy as np


def warmup(lengths=(32, 64, 128, 160), edit_distances=(1, 2),
           verbose: bool = True) -> None:
    from .runtime import configure_jax
    configure_jax()
    from .ops.edit import within_edit_distance_auto
    from .ops.encode import pack_nibbles
    from .ops.pallas_hamming import ROW_BLOCK, rowwise_within_packed
    from .ops.pallas_hamming import within_tile_kernel

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    for length in lengths:
        t0 = time.perf_counter()
        a = rng.integers(0, 5, size=(2048, length), dtype=np.uint8)
        b = rng.integers(0, 5, size=(2048, length), dtype=np.uint8)
        np.asarray(within_tile_kernel(a, b, 5, 1))
        log(f"all-pairs tile kernel Lp<={length}: "
            f"{time.perf_counter() - t0:.1f}s")
        lanes = max(-(-length // 8), 1)
        t0 = time.perf_counter()
        pa = pack_nibbles(a[:ROW_BLOCK], lanes)
        np.asarray(rowwise_within_packed(pa, pa, 1))
        log(f"rowwise packed kernel lanes={lanes}: "
            f"{time.perf_counter() - t0:.1f}s")
        for d in edit_distances:
            from .ops.edit import EDIT_VERIFY_BATCH
            for p in (64, EDIT_VERIFY_BATCH):
                t0 = time.perf_counter()
                ap = np.resize(a, (p, length))
                bp = np.resize(b, (p, length))
                la = np.full(p, length, dtype=np.int64)
                np.asarray(within_edit_distance_auto(ap, la, bp, la, d))
                log(f"banded edit kernel Lp<={length} d={d} P={p}: "
                    f"{time.perf_counter() - t0:.1f}s")


_prewarmed_geometries: set = set()


def prewarm_async(length: int, alphabet_size: int = 5,
                  max_distance: int = 1,
                  use_edit_distance: bool = False):
    """Load every device program a dedup run of this geometry will need,
    on a daemon thread (returns it started).

    Program LOADING (cache deserialization + upload to a possibly-remote
    TPU) blocks the calling thread per program; running it concurrently
    with pass-1 ingest hides it entirely for non-trivial inputs.

    No-op (returns None) off-TPU: CPU runs compile cheaply inline, and a
    compile-in-flight daemon thread at interpreter exit aborts the
    process.

    Once-per-process per geometry: loaded programs stay resident for the
    process lifetime, so re-dispatching them on later runs would spend
    ~0.3 s of pure dispatch round-trips per run for nothing (measured
    through a tunneled TPU).
    """
    import threading

    import jax

    if jax.default_backend() != "tpu":
        return None
    geometry = (length, alphabet_size, max_distance, use_edit_distance)
    if geometry in _prewarmed_geometries:
        return None
    _prewarmed_geometries.add(geometry)

    def work():
        try:
            rng = np.random.default_rng(0)
            if use_edit_distance:
                # Warm BOTH canonical pair-batch geometries (the engine
                # verifies in EDIT_VERIFY_BATCH batches; tiny runs use the
                # single-block geometry) at the production length padding.
                from .ops.edit import (
                    EDIT_VERIFY_BATCH,
                    within_edit_distance_auto,
                )
                for p in (8, EDIT_VERIFY_BATCH):
                    a = rng.integers(0, 4, size=(p, max(length, 1)),
                                     dtype=np.uint8)
                    la = np.full(p, length, dtype=np.int64)
                    np.asarray(within_edit_distance_auto(
                        a, la, a, la, max_distance))
            else:
                from .ops.bucket import (
                    SIZE_CLASSES,
                    _bucketed_within,
                    _buckets_per_call,
                )
                from .ops.pallas_hamming import within_tile_packed
                a = rng.integers(0, max(alphabet_size, 2),
                                 size=(2048, max(length, 1)),
                                 dtype=np.uint8)
                futures = [within_tile_packed(a, a, alphabet_size,
                                              max_distance)]
                for size_class in SIZE_CLASSES:
                    k = _buckets_per_call(size_class)
                    batch = np.full((k, size_class, max(length, 1)), 0xFF,
                                    dtype=np.uint8)
                    futures.append(_bucketed_within(
                        batch, alphabet_size, max_distance))
                for f in futures:
                    f.block_until_ready()
        except Exception:  # pragma: no cover — prewarm is best-effort
            pass

    thread = threading.Thread(target=work, daemon=True,
                              name="fastqdedup-prewarm")
    thread.start()
    return thread


if __name__ == "__main__":
    warmup()

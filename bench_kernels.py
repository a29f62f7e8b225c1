"""Kernel microbenchmarks vs the chip roofline (BASELINE.md north star 3).

Times the production device kernels at production shapes and reports
achieved int8 op throughput against the MXU peak (and bytes/s against HBM
bandwidth for the VPU kernels).  Launches are pipelined (async dispatch,
block on the last result) so the measurement reflects device throughput,
not tunnel round-trip latency.

Prints one JSON line per kernel:
    {"kernel": ..., "wall_s": ..., "achieved_top_s": ...,
     "peak_top_s": ..., "pct_speed_of_light": ..., "pairs_per_s": ...}

Peak numbers are configurable for the local chip via env:
    BENCH_PEAK_INT8_TOPS  (default 394.0 — TPU v5e MXU int8)
    BENCH_HBM_GBPS        (default 819.0 — TPU v5e HBM)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PEAK_INT8_TOPS = float(os.environ.get("BENCH_PEAK_INT8_TOPS", 394.0))
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819.0))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 100))


def _time_pipelined(launch, n_calls: int) -> float:
    """Amortized seconds per call: enqueue n_calls async, then force and
    FETCH every result.

    ``launch`` must return a small on-device array that data-depends on
    the kernel output (e.g. ``jnp.sum(kernel(...))``): through a tunneled
    TPU, ``block_until_ready`` alone can return before remote execution
    finishes (measured: it reported 6x the chip's peak), so the only
    trustworthy completion signal is bytes of the result on the host.
    Fetching a scalar keeps the D2H out of the measurement."""
    import jax.numpy as jnp

    def run_once() -> float:
        t0 = time.perf_counter()
        futures = [launch() for _ in range(n_calls)]
        # One stacked fetch: a per-future fetch would add one tunnel
        # round trip per call to the measurement.
        np.asarray(jnp.stack(futures))
        return time.perf_counter() - t0

    run_once()  # warm: kernel compile, program load, AND the stack fetch
    # Best of several repetitions: the tunnel's scheduling jitter swings
    # identical repetitions several-fold; the minimum reflects the chip.
    return min(run_once() for _ in range(5)) / n_calls


def bench_tile_kernel() -> None:
    """All-pairs one-hot MXU tile kernel (ops/pallas_hamming.py)."""
    from fastqdedup_tpu.ops.pallas_hamming import (
        _pad_dims,
        within_tile_packed,
    )

    import jax

    from fastqdedup_tpu.ops.pallas_hamming import _within_tile_padded

    n = m = 2048
    rng = np.random.default_rng(0)
    a = rng.integers(0, 5, size=(n, READ_LEN), dtype=np.uint8)
    b = rng.integers(0, 5, size=(m, READ_LEN), dtype=np.uint8)
    l_pad, a_pad = _pad_dims(READ_LEN, 5)
    # Stage operands on device ONCE: through a tunneled TPU the H2D
    # transfer costs more than the kernel, and production overlaps
    # transfers with compute — the roofline question is chip throughput.
    ap = jax.device_put(np.pad(a, ((0, 0), (0, l_pad - READ_LEN)),
                               constant_values=0xFF))
    bp = jax.device_put(np.pad(b, ((0, 0), (0, l_pad - READ_LEN)),
                               constant_values=0xFF))
    scal = jax.device_put(np.array([[READ_LEN, 1]], dtype=np.int32))
    import jax.numpy as jnp
    tile_sum = jax.jit(lambda sc, x, y: jnp.sum(
        _within_tile_padded(sc, x, y, a_pad).astype(jnp.int32)))
    per_call = _time_pipelined(lambda: tile_sum(scal, ap, bp), 16)
    # Parity spot check vs the host-input wrapper.
    got = np.asarray(_within_tile_padded(scal, ap, bp, a_pad))
    want = np.asarray(within_tile_packed(a, b, 5, 1))
    assert (got == want).all()
    # int8 MACs: match-count contraction over Lp*Ap plus the bitpack
    # contraction over M (2 ops per MAC).
    ops = 2.0 * n * m * (l_pad * a_pad) + 2.0 * n * m * (m // 8)
    achieved = ops / per_call / 1e12
    print(json.dumps({
        "kernel": f"within_tile_packed 2048x2048 L={READ_LEN}"
                  f" (Lp={l_pad}, Ap={a_pad})",
        "wall_s": round(per_call, 5),
        "achieved_top_s": round(achieved, 2),
        "peak_top_s": PEAK_INT8_TOPS,
        "pct_speed_of_light": round(100 * achieved / PEAK_INT8_TOPS, 1),
        "pairs_per_s": round(n * m / per_call / 1e6, 1),
        "pairs_unit": "M pairs/s",
    }), flush=True)


def bench_rowwise_kernel() -> None:
    """Packed XOR+popcount rowwise kernel (candidate verification)."""
    from fastqdedup_tpu.ops.encode import pack_nibbles
    from fastqdedup_tpu.ops.pallas_hamming import (
        ROW_BLOCK,
        rowwise_within_packed,
    )

    p = 1 << 17
    lanes = max(-(-READ_LEN // 8), 1)
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 5, size=(p, READ_LEN), dtype=np.uint8)
    pa = pack_nibbles(rows, lanes)
    pb = pack_nibbles(rows[::-1].copy(), lanes)
    assert p % ROW_BLOCK == 0
    import jax

    da = jax.device_put(pa)
    db = jax.device_put(pb)
    import jax.numpy as jnp
    row_sum = jax.jit(lambda x, y: jnp.sum(
        rowwise_within_packed(x, y, 1).astype(jnp.int32)))
    per_call = _time_pipelined(lambda: row_sum(da, db), 16)
    bytes_touched = 2.0 * p * lanes * 4 + p
    gbps = bytes_touched / per_call / 1e9
    print(json.dumps({
        "kernel": f"rowwise_within_packed P={p} lanes={lanes}",
        "wall_s": round(per_call, 5),
        "achieved_gb_s": round(gbps, 1),
        "peak_gb_s": HBM_GBPS,
        "pct_speed_of_light": round(100 * gbps / HBM_GBPS, 1),
        "pairs_per_s": round(p / per_call / 1e6, 1),
        "pairs_unit": "M pairs/s",
    }), flush=True)


def bench_bucket_kernel() -> None:
    """Batched per-bucket all-pairs kernel at each production size class."""
    from fastqdedup_tpu.ops.bucket import (
        SIZE_CLASSES,
        _bucketed_within,
        _buckets_per_call,
    )

    import jax

    rng = np.random.default_rng(2)
    for size_class in SIZE_CLASSES:
        if size_class < 32:
            continue  # tiny classes are dispatch-bound, not compute-bound
        k = _buckets_per_call(size_class)
        batch = rng.integers(
            0, 5, size=(k, size_class, READ_LEN), dtype=np.uint8)
        l_pad = max(-(-READ_LEN // 16) * 16, 16)
        if jax.default_backend() == "tpu" and size_class % 128 == 0:
            # Device-staged operands (see bench_tile_kernel) against the
            # Pallas bucketed kernel the TPU path dispatches to.
            from fastqdedup_tpu.ops.pallas_hamming import \
                bucket_within_packed
            bp = jax.device_put(np.pad(
                batch, ((0, 0), (0, 0), (0, l_pad - READ_LEN)),
                constant_values=0xFF))
            scal = jax.device_put(np.array([[READ_LEN, 1]],
                                           dtype=np.int32))
            import jax.numpy as jnp
            bucket_sum = jax.jit(lambda x, sc: jnp.sum(
                bucket_within_packed(x, sc, 8).astype(jnp.int32)))
            per_call = _time_pipelined(
                lambda: bucket_sum(bp, scal), 8)
        else:
            per_call = _time_pipelined(
                lambda: _bucketed_within(batch, 5, 1), 8)
        ops = 2.0 * k * size_class * size_class * (l_pad * 8)
        achieved = ops / per_call / 1e12
        print(json.dumps({
            "kernel": f"bucketed_within K={k} S={size_class} L={READ_LEN}",
            "wall_s": round(per_call, 5),
            "achieved_top_s": round(achieved, 2),
            "peak_top_s": PEAK_INT8_TOPS,
            "pct_speed_of_light": round(100 * achieved / PEAK_INT8_TOPS, 1),
            "pairs_per_s": round(
                k * size_class * size_class / per_call / 1e6, 1),
            "pairs_unit": "M pairs/s",
        }), flush=True)


def bench_edit_kernel() -> None:
    """Banded Levenshtein DP kernel at the production batch geometry."""
    import jax

    from fastqdedup_tpu.ops.edit import (
        EDIT_VERIFY_BATCH,
        within_edit_distance_auto,
    )

    p = EDIT_VERIFY_BATCH
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, size=(p, READ_LEN), dtype=np.uint8)
    la = np.full(p, READ_LEN, dtype=np.int64)

    def launch():
        out = within_edit_distance_auto(a, la, a, la, 1)
        return out if hasattr(out, "block_until_ready") else jax.block_until_ready(out)

    # within_edit_distance_auto pads internally and returns a sliced array;
    # time through np.asarray completion instead of block_until_ready.
    within_edit_distance_auto(a, la, a, la, 1)  # warm
    t0 = time.perf_counter()
    n_calls = 4
    for _ in range(n_calls):
        np.asarray(within_edit_distance_auto(a, la, a, la, 1))
    per_call = (time.perf_counter() - t0) / n_calls
    # Band DP: L rows x W=3 cells x ~8 VPU ops per cell per pair.
    ops = 1.0 * p * READ_LEN * 3 * 8
    print(json.dumps({
        "kernel": f"banded_edit d=1 P={p} L={READ_LEN}",
        "wall_s": round(per_call, 5),
        "achieved_gop_s": round(ops / per_call / 1e9, 1),
        "pairs_per_s": round(p / per_call / 1e6, 2),
        "pairs_unit": "M pairs/s",
    }), flush=True)


def main() -> None:
    from fastqdedup_tpu.runtime import configure_jax
    configure_jax()
    import jax

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    bench_tile_kernel()
    bench_rowwise_kernel()
    bench_bucket_kernel()
    bench_edit_kernel()


if __name__ == "__main__":
    main()

"""Batched / all-pairs Hamming distance on TPU.

Replaces the reference's per-pair scalar loop (distances.h:8-31) and the
trie's fast-fail Hamming walk (_triemodule.c:380-495) with dense formulations
that map onto TPU compute units:

* **MXU path** (:func:`pairwise_hamming`): one-hot the index matrices to int8
  ``[N, L*A]`` and compute pairwise *match counts* as an int8 x int8 -> int32
  matmul on the systolic array; ``distance = L - matches``.  Exact integer
  arithmetic, full MXU utilization, and XLA fuses the one-hot expansion into
  the matmul operands.
* **Pallas VPU path** (:mod:`fastqdedup_tpu.ops.pallas_hamming`): 4-bit
  packed XOR + popcount producing an adjacency bitmap tile directly,
  avoiding the [N, M] int32 round-trip through HBM.

Callers tile over groups/buckets; this module exposes jitted tile kernels
plus a host orchestrator that emits within-distance index pairs.
"""

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("alphabet_size",))
def _match_counts(a: jax.Array, b: jax.Array, alphabet_size: int
                  ) -> jax.Array:
    """Pairwise match counts between index matrices a [N, L] and b [M, L].

    int8 one-hot -> dot_general with int32 accumulation (MXU on TPU).
    """
    n, length = a.shape
    a_oh = jax.nn.one_hot(a, alphabet_size, dtype=jnp.int8)
    b_oh = jax.nn.one_hot(b, alphabet_size, dtype=jnp.int8)
    a_flat = a_oh.reshape(n, length * alphabet_size)
    b_flat = b_oh.reshape(b.shape[0], length * alphabet_size)
    return jax.lax.dot_general(
        a_flat, b_flat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("alphabet_size",))
def pairwise_hamming(a: jax.Array, b: jax.Array, alphabet_size: int
                     ) -> jax.Array:
    """int32 [N, M] Hamming distances between equal-length index rows."""
    return a.shape[1] - _match_counts(a, b, alphabet_size)


@functools.partial(jax.jit, static_argnames=("alphabet_size", "max_distance"))
def pairwise_within(a: jax.Array, b: jax.Array, alphabet_size: int,
                    max_distance: int) -> jax.Array:
    """bool [N, M]: Hamming(a_i, b_j) <= max_distance."""
    return pairwise_hamming(a, b, alphabet_size) <= max_distance


@functools.partial(jax.jit, static_argnames=("alphabet_size", "max_distance"))
def rowwise_within(a: jax.Array, b: jax.Array, alphabet_size: int,
                   max_distance: int) -> jax.Array:
    """bool [N]: Hamming(a_i, b_i) <= max_distance (paired rows)."""
    mismatches = jnp.sum(a != b, axis=1, dtype=jnp.int32)
    return mismatches <= max_distance


def _pad_rows(matrix: np.ndarray, target: int) -> np.ndarray:
    if matrix.shape[0] == target:
        return matrix
    # 0xFF one-hots to all-zero, so padding rows match nothing — keeps the
    # host-side nonzero() from wading through pad-vs-pad hits.
    pad = np.full((target - matrix.shape[0], matrix.shape[1]), 0xFF,
                  dtype=matrix.dtype)
    return np.concatenate([matrix, pad], axis=0)


def _tile_size_for(n: int, tile: int) -> int:
    """Fixed tile size (a single compiled kernel shape).  Padding small
    inputs up to the tile wastes negligible device time; a ladder of
    power-of-two shapes would each pay a minutes-long cold Mosaic compile
    through a remote TPU."""
    del n
    return tile


def neighbor_pairs(matrix: np.ndarray, alphabet_size: int, max_distance: int,
                   tile: int = 2048,
                   use_pallas: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """All index pairs (i < j) of rows of ``matrix`` within ``max_distance``.

    Tiles the [N, N] upper triangle; each tile runs on device and only a
    boolean tile returns to the host, where ``np.nonzero`` extracts pairs.
    Returns two int64 arrays (rows_i, rows_j).
    """
    n = matrix.shape[0]
    if n < 2:
        return (np.empty(0, dtype=np.int64),) * 2
    kernel = None
    unpack = None
    if use_pallas:
        try:
            from .pallas_hamming import unpack_within, within_tile_packed
            kernel = within_tile_packed
            unpack = unpack_within
        except Exception:
            kernel = None
    t = _tile_size_for(n, tile)
    out_i: List[np.ndarray] = []
    out_j: List[np.ndarray] = []
    for i0 in range(0, n, t):
        a = _pad_rows(matrix[i0:i0 + t], t)
        for j0 in range(i0, n, t):
            b = _pad_rows(matrix[j0:j0 + t], t)
            if kernel is not None:
                within = unpack(kernel(a, b, alphabet_size, max_distance))
            else:
                within = np.asarray(
                    pairwise_within(a, b, alphabet_size, max_distance))
            ii, jj = np.nonzero(within)
            ii = ii + i0
            jj = jj + j0
            keep = (ii < jj) & (ii < n) & (jj < n)
            out_i.append(ii[keep])
            out_j.append(jj[keep])
    if not out_i:
        return (np.empty(0, dtype=np.int64),) * 2
    return (np.concatenate(out_i).astype(np.int64),
            np.concatenate(out_j).astype(np.int64))


def verify_pairs(matrix: np.ndarray, pairs_i: np.ndarray,
                 pairs_j: np.ndarray, alphabet_size: int, max_distance: int,
                 batch: int = 1 << 20) -> np.ndarray:
    """bool mask over candidate pairs: full Hamming <= max_distance.

    Used after pigeonhole bucketing to verify candidates; rowwise (paired)
    comparison, so cost is O(pairs * L) on the VPU.  When the alphabet fits
    in 4 bits the Pallas XOR+popcount kernel runs over nibble-packed lanes
    (8 bases per uint32); otherwise a jnp elementwise compare.
    """
    packed_kernel = None
    if alphabet_size <= 16:
        try:
            from .encode import pack_nibbles
            from .pallas_hamming import ROW_BLOCK, rowwise_within_packed
            packed_kernel = (pack_nibbles, ROW_BLOCK, rowwise_within_packed)
        except Exception:
            packed_kernel = None
    out = np.empty(len(pairs_i), dtype=bool)
    for start in range(0, len(pairs_i), batch):
        sl = slice(start, start + batch)
        a = matrix[pairs_i[sl]]
        b = matrix[pairs_j[sl]]
        if packed_kernel is not None:
            pack, row_block, kernel = packed_kernel
            lanes = max(-(-matrix.shape[1] // 8), 1)
            p = len(a)
            padded = -(-max(p, 1) // row_block) * row_block
            pa = np.zeros((padded, lanes), dtype=np.uint32)
            pb = np.zeros((padded, lanes), dtype=np.uint32)
            pa[:p] = pack(a, lanes)
            pb[:p] = pack(b, lanes)
            out[sl] = np.asarray(kernel(pa, pb, max_distance))[:p, 0]
        else:
            out[sl] = np.asarray(
                rowwise_within(a, b, alphabet_size, max_distance))
    return out

"""Pigeonhole bucketing: near-duplicate candidate generation.

This is the TPU-native replacement for the radix trie's *search* role
(_triemodule.c:380-495).  Two equal-length keys within Hamming distance d
must agree exactly on at least one of any d+1 disjoint segments, so bucketing
keys by (segment index, segment content) and comparing only within buckets
finds every within-distance pair while skipping almost all of the N^2 space.

Within-bucket comparison: rows are sorted by bucket, rows in singleton
buckets are dropped, and the remainder is swept with diagonal + adjacent
off-diagonal tiles of the fixed-shape Pallas all-pairs kernel
(ops/pallas_hamming.py) — one compiled executable for every input size,
with per-tile results filtered to same-bucket pairs on the host.

For the ``--edit`` (Levenshtein) mode, a shifted-segment variant generates
candidates across length differences up to d, verified by the banded DP in
:mod:`fastqdedup_tpu.ops.edit`.
"""

from typing import List, Tuple

import numpy as np

_PAD_INDEX = 0xFF  # one-hot of an out-of-range index is all-zero


def _row_group_ids(rows: np.ndarray) -> np.ndarray:
    """Dense group id per row of a uint8 matrix (equal rows, equal id)."""
    if rows.shape[1] == 0:
        return np.zeros(rows.shape[0], dtype=np.int64)
    void = np.ascontiguousarray(rows).view(
        np.dtype((np.void, rows.shape[1] * rows.itemsize))).ravel()
    _, inverse = np.unique(void, return_inverse=True)
    return inverse.astype(np.int64)


def segment_bounds(length: int, num_segments: int) -> List[Tuple[int, int]]:
    """Split [0, length) into ``num_segments`` near-equal contiguous spans."""
    bounds = []
    base, extra = divmod(length, num_segments)
    start = 0
    for s in range(num_segments):
        end = start + base + (1 if s < extra else 0)
        bounds.append((start, end))
        start = end
    return bounds


def _iter_bucket_slices(group_ids: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort rows by group; return (order, starts, ends) of each group."""
    order = np.argsort(group_ids, kind="stable")
    sorted_ids = group_ids[order]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(group_ids)]])
    return order, starts, ends


def _hamming_tile_kernel(a_rows: np.ndarray, b_rows: np.ndarray,
                         matrix: np.ndarray, alphabet_size: int,
                         max_distance: int, tile: int):
    """Launch one [tile, tile] all-pairs Pallas comparison (async).

    Rows are padded to ``tile`` with _PAD_INDEX rows, which match nothing.
    """
    from .pallas_hamming import within_tile_kernel

    length = matrix.shape[1]
    a = np.full((tile, length), _PAD_INDEX, dtype=np.uint8)
    b = np.full((tile, length), _PAD_INDEX, dtype=np.uint8)
    a[:len(a_rows)] = matrix[a_rows]
    b[:len(b_rows)] = matrix[b_rows]
    return within_tile_kernel(a, b, alphabet_size, max_distance)


def hamming_neighbor_pairs_bucketed(
        matrix: np.ndarray, alphabet_size: int, max_distance: int,
        large_bucket_threshold: int = 2048, tile: int = 2048
        ) -> Tuple[np.ndarray, np.ndarray]:
    """All pairs (i < j) of equal-length rows within Hamming max_distance,
    via pigeonhole bucketing.  Exact (complete) by the pigeonhole principle.

    Rows are sorted by (segment-index, segment-content) bucket; rows whose
    bucket is a singleton are dropped (no candidate mates), and the rest is
    swept with diagonal + adjacent off-diagonal [tile, tile] blocks of the
    SAME fixed-shape Pallas kernel (a bucket of size <= tile straddles at
    most one tile boundary, so those two block families cover every
    within-bucket pair).  One kernel executable serves every input size —
    cold Mosaic compiles through a remote TPU cost minutes, so shape
    diversity is the enemy.  Buckets larger than
    min(large_bucket_threshold, tile) get a dedicated all-pairs sweep.
    """
    n, length = matrix.shape
    if n < 2:
        return (np.empty(0, dtype=np.int64),) * 2
    if length <= max_distance:
        # Every pair is trivially within distance; complete graph.
        ii, jj = np.triu_indices(n, k=1)
        return ii.astype(np.int64), jj.astype(np.int64)

    max_small = min(large_bucket_threshold, tile)
    pair_codes: List[np.ndarray] = []
    launched = []  # (a_rows, b_rows, ids_a, ids_b, future)
    oversized: List[np.ndarray] = []
    # Phase 1: enqueue every tile block (async device dispatch).
    for seg_start, seg_end in segment_bounds(length, max_distance + 1):
        group_ids = _row_group_ids(matrix[:, seg_start:seg_end])
        order = np.argsort(group_ids, kind="stable")
        sorted_ids = group_ids[order]
        counts = np.bincount(sorted_ids)
        sizes_per_row = counts[sorted_ids]
        small = (sizes_per_row >= 2) & (sizes_per_row <= max_small)
        rows = order[small]
        ids = sorted_ids[small]
        m = len(rows)
        for i0 in range(0, m, tile):
            spans = [(i0, i0)]
            if i0 + tile < m:
                spans.append((i0, i0 + tile))
            for (a0, b0) in spans:
                a_rows = rows[a0:a0 + tile]
                b_rows = rows[b0:b0 + tile]
                future = _hamming_tile_kernel(
                    a_rows, b_rows, matrix, alphabet_size, max_distance,
                    tile)
                launched.append((a_rows, b_rows, ids[a0:a0 + tile],
                                 ids[b0:b0 + tile], future))
        # Oversized buckets: dedicated all-pairs sweep per bucket.
        for b in np.flatnonzero(counts > max_small):
            span = np.flatnonzero(sorted_ids == b)
            oversized.append(order[span])
    # Phase 2: drain — device compute and D2H transfers overlap the host
    # pair extraction of earlier blocks.
    for a_rows, b_rows, ids_a, ids_b, future in launched:
        within = np.asarray(future)[:len(a_rows), :len(b_rows)]
        ii, jj = np.nonzero(within)
        ga, gb = a_rows[ii], b_rows[jj]
        keep = (ga != gb) & (ids_a[ii] == ids_b[jj])
        ga, gb = ga[keep], gb[keep]
        pair_codes.append(np.minimum(ga, gb) * n + np.maximum(ga, gb))
    from .hamming import neighbor_pairs
    for idx in oversized:
        li, lj = neighbor_pairs(matrix[idx], alphabet_size, max_distance)
        gi, gj = idx[li], idx[lj]
        pair_codes.append(np.minimum(gi, gj) * n + np.maximum(gi, gj))

    if not pair_codes:
        return (np.empty(0, dtype=np.int64),) * 2
    codes = np.unique(np.concatenate(pair_codes))
    return codes // n, codes % n


def edit_candidate_pairs(matrices: List[np.ndarray],
                         group_indices: List[np.ndarray],
                         max_distance: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Candidate (i, j) global-index pairs for the Levenshtein mode.

    ``matrices``: one uint8 index matrix per length group (rows = keys of one
    length); ``group_indices``: the global key index of each row.  If
    lev(a, b) <= d then splitting a into d+1 segments leaves at least one
    segment that occurs *exactly* in b, shifted by at most d positions — so
    probing every segment of every key against every d-shifted window of
    every length-compatible key generates a complete candidate superset.
    Pairs must still be verified with the exact DP.
    """
    num_segments = max_distance + 1
    probe_codes: List[np.ndarray] = []

    # Build, for every group, windows of each (position, width) we may need,
    # then join via np.unique on the concatenated (width, start, bytes) keys.
    entries: List[Tuple[bytes, int]] = []  # (window payload, global index)
    for matrix, gidx in zip(matrices, group_indices):
        n, length = matrix.shape
        if n == 0 or length == 0:
            continue
        for seg_start, seg_end in segment_bounds(length, num_segments):
            width = seg_end - seg_start
            if width == 0:
                continue
            for shift in range(-max_distance, max_distance + 1):
                w_start = seg_start + shift
                for other, oidx in zip(matrices, group_indices):
                    olen = other.shape[1]
                    if abs(olen - length) > max_distance:
                        continue
                    if w_start < 0 or w_start + width > olen:
                        continue
                    window = other[:, w_start:w_start + width]
                    a_side = matrix[:, seg_start:seg_end]
                    # Join a-side segment content with b-side windows.
                    probe_codes.append(
                        _join_pairs(a_side, gidx, window, oidx))
    if not probe_codes:
        return (np.empty(0, dtype=np.int64),) * 2
    codes = np.unique(np.concatenate(probe_codes))
    return _decode_pair_codes(codes)


_PAIR_BASE = 1 << 31


def _join_pairs(a_rows: np.ndarray, a_idx: np.ndarray,
                b_rows: np.ndarray, b_idx: np.ndarray) -> np.ndarray:
    """Unordered pair codes (min * BASE + max) for rows with equal content."""
    if not len(a_rows) or not len(b_rows):
        return np.empty(0, dtype=np.int64)
    both = np.concatenate([a_rows, b_rows], axis=0)
    ids = _row_group_ids(both)
    a_ids, b_ids = ids[:len(a_rows)], ids[len(a_rows):]
    out: List[np.ndarray] = []
    order_a, starts_a, ends_a = _iter_bucket_slices(a_ids)
    order_b, starts_b, ends_b = _iter_bucket_slices(b_ids)
    ga = a_ids[order_a[starts_a]]
    gb = b_ids[order_b[starts_b]]
    pa = pb = 0
    while pa < len(ga) and pb < len(gb):
        if ga[pa] < gb[pb]:
            pa += 1
        elif ga[pa] > gb[pb]:
            pb += 1
        else:
            ia = a_idx[order_a[starts_a[pa]:ends_a[pa]]]
            ib = b_idx[order_b[starts_b[pb]:ends_b[pb]]]
            gi = np.repeat(ia, len(ib))
            gj = np.tile(ib, len(ia))
            keep = gi != gj
            gi, gj = gi[keep], gj[keep]
            out.append(np.minimum(gi, gj) * _PAIR_BASE +
                       np.maximum(gi, gj))
            pa += 1
            pb += 1
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out)


def _decode_pair_codes(codes: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    return codes // _PAIR_BASE, codes % _PAIR_BASE

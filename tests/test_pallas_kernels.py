"""Pallas TPU kernels vs numpy references.

Runs in interpreter mode on the CPU test mesh (tests/conftest.py); the same
kernels compile natively on TPU.  Semantics pinned: all-pairs and paired-row
Hamming "within distance" per the reference's distances.h:8-31.
"""

import numpy as np
import pytest

from fastqdedup_tpu.ops.encode import pack_nibbles
from fastqdedup_tpu.ops.pallas_hamming import (
    ROW_BLOCK,
    within_tile_kernel,
    rowwise_within_packed,
)


def mutated_pair(rng, n, length, alphabet):
    a = rng.integers(0, alphabet, size=(n, length), dtype=np.uint8)
    b = a.copy()
    for i in range(n):
        for _ in range(rng.integers(0, 4)):
            b[i, rng.integers(length)] = rng.integers(alphabet)
    return a, b


@pytest.mark.parametrize("length,alphabet,max_distance", [
    (24, 5, 1), (16, 4, 2), (31, 6, 0),
])
def test_within_tile_kernel_matches_numpy(length, alphabet, max_distance):
    rng = np.random.default_rng(7)
    a, b = mutated_pair(rng, 128, length, alphabet)
    got = np.asarray(within_tile_kernel(a, b, alphabet, max_distance))
    want = (a[:, None, :] != b[None, :, :]).sum(2) <= max_distance
    np.testing.assert_array_equal(got, want)


def test_within_tile_kernel_multi_tile_grid():
    rng = np.random.default_rng(8)
    a, b = mutated_pair(rng, 256, 12, 5)
    got = np.asarray(within_tile_kernel(a, b, 5, 1))
    want = (a[:, None, :] != b[None, :, :]).sum(2) <= 1
    assert got.shape == (256, 256)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("buckets,size,length,max_distance", [
    (3, 128, 20, 1), (2, 256, 33, 2),
])
def test_bucket_within_packed_matches_numpy(buckets, size, length,
                                            max_distance):
    """Per-bucket all-pairs kernel (interpret mode) vs brute force,
    including _PAD_SYMBOL rows (match nothing) and padded length."""
    from fastqdedup_tpu.ops.pallas_hamming import bucket_within_packed

    rng = np.random.default_rng(9)
    l_pad = -(-length // 16) * 16
    batch = np.full((buckets, size, l_pad), 0xFF, dtype=np.uint8)
    fills = []
    for k in range(buckets):
        fill = int(rng.integers(2, size))
        a, _ = mutated_pair(rng, fill, length, 5)
        batch[k, :fill, :length] = a
        fills.append(fill)
    scalars = np.array([[length, max_distance]], dtype=np.int32)
    got = np.asarray(bucket_within_packed(batch, scalars, 8))
    assert got.shape == (buckets, size, size // 8)
    unpacked = np.unpackbits(got, axis=-1, bitorder="little")
    for k, fill in enumerate(fills):
        rows = batch[k, :fill, :length]
        want = (rows[:, None, :] != rows[None, :, :]).sum(2) <= max_distance
        np.testing.assert_array_equal(
            unpacked[k, :fill, :fill].astype(bool), want)
        # Padded rows match nothing, including each other.
        assert not unpacked[k, fill:, :].any()
        assert not unpacked[k, :, fill:].any()


@pytest.mark.parametrize("length,max_distance", [(24, 1), (7, 2), (40, 0)])
def test_rowwise_within_packed_matches_numpy(length, max_distance):
    rng = np.random.default_rng(9)
    n = 100
    a, b = mutated_pair(rng, n, length, 5)
    lanes = max(-(-length // 8), 1)
    pa = np.zeros((ROW_BLOCK, lanes), dtype=np.uint32)
    pb = np.zeros((ROW_BLOCK, lanes), dtype=np.uint32)
    pa[:n] = pack_nibbles(a, lanes)
    pb[:n] = pack_nibbles(b, lanes)
    got = np.asarray(rowwise_within_packed(pa, pb, max_distance))[:n, 0]
    want = (a != b).sum(1) <= max_distance
    np.testing.assert_array_equal(got, want)


def test_verify_pairs_uses_packed_kernel():
    from fastqdedup_tpu.ops.hamming import verify_pairs
    rng = np.random.default_rng(10)
    matrix = rng.integers(0, 5, size=(64, 20), dtype=np.uint8)
    pi = rng.integers(0, 64, size=500).astype(np.int64)
    pj = rng.integers(0, 64, size=500).astype(np.int64)
    got = verify_pairs(matrix, pi, pj, 5, 1)
    want = (matrix[pi] != matrix[pj]).sum(1) <= 1
    np.testing.assert_array_equal(got, want)


class TestBandedEdit:
    """Banded Levenshtein Pallas kernel vs the full-row scan DP and the
    scalar host oracle (truth table from the reference's
    tests/test__distance.py:37-60)."""

    CASES = [
        ("", "", 0, True), ("A", "", 1, True), ("", "AB", 1, False),
        ("ABC", "ABC", 0, True), ("ABC", "ABD", 1, True),
        ("ABC", "ABD", 0, False), ("GC", "AAAGC", 2, False),
        ("GC", "AAAGC", 3, True), ("ABCDE", "ABDEF", 2, True),
        ("ABCDE", "ABDEF", 1, False), ("AAAA", "AAA", 1, True),
        ("AAAA", "AA", 1, False), ("ACGT", "AGCT", 2, True),
    ]

    def _run(self, pairs, max_distance):
        from fastqdedup_tpu.ops.pallas_edit import (
            PAIR_BLOCK, banded_within_edit_distance)
        lmax = max(max((len(a) for a, b in pairs), default=1),
                   max((len(b) for a, b in pairs), default=1), 1)
        p = PAIR_BLOCK
        A = np.full((p, lmax), 0xFF, dtype=np.uint8)
        B = np.full((p, lmax), 0xEE, dtype=np.uint8)
        la = np.zeros(p, dtype=np.int32)
        lb = np.zeros(p, dtype=np.int32)
        for i, (a, b) in enumerate(pairs):
            A[i, :len(a)] = np.frombuffer(a.encode(), dtype=np.uint8)
            B[i, :len(b)] = np.frombuffer(b.encode(), dtype=np.uint8)
            la[i], lb[i] = len(a), len(b)
        out = np.asarray(banded_within_edit_distance(
            A, la, B, lb, max_distance))[:len(pairs), 0]
        return out

    @pytest.mark.parametrize("d", [0, 1, 2, 3])
    def test_truth_table(self, d):
        cases = [(a, b) for a, b, cd, _ in self.CASES if cd == d]
        wants = [w for a, b, cd, w in self.CASES if cd == d]
        if not cases:
            return
        got = self._run(cases, d)
        assert list(got) == wants

    @pytest.mark.parametrize("d", [1, 2])
    def test_fuzz_against_scalar_oracle(self, d):
        from fastqdedup_tpu.distance import within_distance
        rng = np.random.default_rng(11)
        pairs = []
        for _ in range(64):
            la = rng.integers(0, 12)
            a = "".join(rng.choice(list("ACGT")) for _ in range(la))
            b = list(a)
            for _ in range(rng.integers(0, 4)):
                op = rng.integers(3)
                if op == 0 and b:
                    b[rng.integers(len(b))] = rng.choice(list("ACGT"))
                elif op == 1 and b:
                    del b[rng.integers(len(b))]
                else:
                    b.insert(rng.integers(len(b) + 1),
                             rng.choice(list("ACGT")))
            pairs.append((a, "".join(b)))
        got = self._run(pairs, d)
        want = [within_distance(a, b, d, use_edit_distance=True)
                for a, b in pairs]
        assert list(got) == want


def test_edit_verify_gathered_packed_matches_unpacked():
    """The nibble-packed resident-key verify path (half H2D through the
    tunnel) must agree with the unpacked path for every candidate pair."""
    import jax.numpy as jnp

    from fastqdedup_tpu.ops.edit import (
        _edit_verify_gathered,
        _edit_verify_gathered_packed,
        pack_nibble_rows,
    )

    rng = np.random.default_rng(17)
    n, l_pad = 300, 32
    padded = np.full((n, l_pad), 0xFF, dtype=np.uint8)
    lens = rng.integers(20, l_pad - 2, n).astype(np.int32)
    for i in range(n):
        padded[i, :lens[i]] = rng.integers(0, 5, lens[i])
    # Plant near pairs so some verifications succeed.
    for i in range(0, n - 1, 3):
        lens[i + 1] = lens[i]
        padded[i + 1] = padded[i]
        padded[i + 1, rng.integers(lens[i])] = rng.integers(5)
    ci = rng.integers(0, n, 512).astype(np.int32)
    cj = rng.integers(0, n, 512).astype(np.int32)
    ref = np.asarray(_edit_verify_gathered(
        jnp.asarray(padded), jnp.asarray(lens),
        jnp.asarray(ci), jnp.asarray(cj), 1))
    got = np.asarray(_edit_verify_gathered_packed(
        jnp.asarray(pack_nibble_rows(padded)), jnp.asarray(lens),
        jnp.asarray(ci), jnp.asarray(cj), 1))
    assert (got == ref).all()

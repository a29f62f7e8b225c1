"""Scalar distance predicate tests.

Golden truth tables pinned from the reference's semantics
(/root/reference/tests/test__distance.py and distances.h:8-88).
"""

import pytest

from fastqdedup_tpu import hamming_distance, within_distance

HAMMING_CASES = [
    ("AAAA", "AAAA", 0, True),
    ("AAAA", "AAA", 3, False),   # unequal length is never within distance
    ("AAAA", "AAAC", 1, True),
    ("AAAA", "AAAC", 0, False),
    ("AACA", "AAAC", 2, True),
    ("AACC", "CCAA", 3, False),
]

LEVENSHTEIN_CASES = [
    ("AAAA", "AAAA", 0, True),
    ("AAAA", "AAA", 1, True),
    ("AAAA", "A", 3, True),
    ("AAA", "C", 2, False),      # one substitution + two deletions = 3
    ("AAA", "C", 3, True),
    ("AAAA", "AAAC", 1, True),
    ("AAAA", "AAAC", 0, False),
    ("AACA", "AAAC", 2, True),
    ("AACC", "CCAA", 3, False),
    ("GATTACA", "GATTAA", 1, True),
    ("GATTACA", "GATTAA", 0, False),
    ("GC", "AAAGC", 3, True),
    ("AAAGC", "GC", 3, True),
    ("GC", "AAAGC", 2, False),
    ("ABCDE", "ABDE", 1, True),
    ("ABCDE", "ABDEF", 2, True),
]


@pytest.mark.parametrize(["s1", "s2", "dist", "expected"], HAMMING_CASES)
def test_within_distance_hamming(s1, s2, dist, expected):
    assert within_distance(s1, s2, dist) is expected


@pytest.mark.parametrize(["s1", "s2", "dist", "expected"],
                         LEVENSHTEIN_CASES)
def test_within_distance_levenshtein(s1, s2, dist, expected):
    assert within_distance(s1, s2, dist, use_edit_distance=True) is expected


def test_hamming_distance_counts():
    assert hamming_distance("AACA", "AAAC") == 2
    assert hamming_distance("AAAA", "AAAA") == 0
    with pytest.raises(ValueError):
        hamming_distance("AAA", "AAAA")


@pytest.mark.parametrize("d", range(6))
def test_levenshtein_exhaustive_vs_bruteforce(d):
    """Cross-check the banded DP against a textbook full DP on random pairs."""
    import itertools
    import random

    rng = random.Random(42 + d)

    def full_lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                cur = dp[j]
                dp[j] = min(prev + (ca != cb), dp[j] + 1, dp[j - 1] + 1)
                prev = cur
        return dp[-1]

    alphabet = "ACGT"
    for _ in range(120):
        a = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 9)))
        b = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 9)))
        expected = full_lev(a, b) <= d
        assert within_distance(a, b, d, use_edit_distance=True) == expected, \
            (a, b, d)
    del itertools

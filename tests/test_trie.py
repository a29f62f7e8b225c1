"""Trie facade tests.

Pins the same SEMANTICS the reference's trie tests pin — approximate
membership, equal-length Hamming clustering vs indel-tolerant edit
clustering, alphabet bookkeeping — but with this project's own fixtures
and with cluster expectations derived from a brute-force within-distance
oracle (plus one hand-pinned golden partition as a cross-check).
"""

import itertools

import pytest

from fastqdedup_tpu import Trie
from fastqdedup_tpu.distance import within_distance


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("probe,d,expect", [
    ("CGTACGTA", 0, True),    # exact
    ("AGTACGTA", 1, True),    # one substitution
    ("CGTACGTT", 1, True),
    ("AGTACGTT", 1, False),   # two substitutions, budget one
    ("AGTACGTT", 2, True),
    ("CGTACGT", 1, False),    # Hamming never crosses lengths
])
def test_fuzzy_membership_hamming(probe, d, expect):
    trie = Trie()
    trie.add_sequence("CGTACGTA")
    assert trie.contains_sequence(probe, d) is expect


@pytest.mark.parametrize("probe,d", [
    (probe, d)
    for probe in ("CGTACGTA", "CGTACGT", "GTACGTA", "CGTAACGTA",
                  "CCTACGT", "TTTT", "")
    for d in (0, 1, 2, 3)
])
def test_fuzzy_membership_edit_matches_levenshtein(probe, d):
    stored = "CGTACGTA"
    trie = Trie()
    trie.add_sequence(stored)
    expect = _lev(stored, probe) <= d
    assert trie.contains_sequence(
        probe, d, use_edit_distance=True) is expect


def test_stored_prefix_is_a_member_but_truncations_are_not():
    trie = Trie()
    trie.add_sequence("TTGCAAC")
    trie.add_sequence("TTGCA")
    assert trie.contains_sequence("TTGCA")
    assert trie.contains_sequence("TTGCAAC")
    # A string between the two stored ones is not a member...
    assert not trie.contains_sequence("TTGCAA")
    # ...but is within edit distance 1 of both.
    assert trie.contains_sequence("TTGCAA", 1, use_edit_distance=True)


READS = ["AAAA", "AAAA", "AAAC", "AAGC", "AGGC", "CCCG", "CCCG",
         "TTCA", "TTCC", "TTTA", "TTT", "TTC"]


def _pop_all(trie):
    clusters = []
    while trie.number_of_sequences:
        clusters.append(set(trie.pop_cluster(
            1, use_edit_distance=getattr(_pop_all, "edit", False))))
    return clusters


def _oracle_partition(reads, d, edit):
    """Connected components of the within-distance relation over unique
    reads, as {(aggregate count, read), ...} sets."""
    uniq = sorted(set(reads))
    parent = list(range(len(uniq)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in itertools.combinations(range(len(uniq)), 2):
        if within_distance(uniq[i], uniq[j], d, edit):
            parent[find(i)] = find(j)
    groups = {}
    for i, read in enumerate(uniq):
        groups.setdefault(find(i), set()).add(
            (reads.count(read), read))
    return list(groups.values())


@pytest.mark.parametrize("edit", [False, True])
def test_pop_cluster_matches_bruteforce_partition(edit):
    trie = Trie()
    for read in READS:
        trie.add_sequence(read)
    clusters = []
    while trie.number_of_sequences:
        clusters.append(set(trie.pop_cluster(1, use_edit_distance=edit)))
    expected = _oracle_partition(READS, 1, edit)
    for cluster in expected:
        assert cluster in clusters
        clusters.remove(cluster)
    assert not clusters


def test_pop_cluster_golden_pin():
    """Hand-pinned golden facts, independent of the oracle above: Hamming
    d=1 keeps the length-3 and length-4 'TT*' reads apart; edit d=1
    merges them through the TTC/TTCA and TTT/TTTA indel bridges."""
    trie = Trie()
    for read in READS:
        trie.add_sequence(read)
    hamming = []
    while trie.number_of_sequences:
        hamming.append(set(trie.pop_cluster(1)))
    assert {(1, "TTT"), (1, "TTC")} in hamming
    assert {(1, "TTCA"), (1, "TTCC"), (1, "TTTA")} in hamming
    assert {(2, "AAAA"), (1, "AAAC"), (1, "AAGC"), (1, "AGGC")} in hamming

    for read in READS:
        trie.add_sequence(read)
    edit = []
    while trie.number_of_sequences:
        edit.append(set(trie.pop_cluster(1, use_edit_distance=True)))
    assert {(1, "TTCA"), (1, "TTCC"), (1, "TTTA"),
            (1, "TTT"), (1, "TTC")} in edit


def test_alphabet_seed_preserved():
    assert Trie(alphabet="acd").alphabet == "acd"


def test_alphabet_rejects_duplicates():
    with pytest.raises(ValueError, match="c was repeated"):
        Trie(alphabet="abcc")


def test_alphabet_grows_on_edge_registration_only():
    trie = Trie()
    trie.add_sequence("abc")
    # First sequence lives whole in a terminal radix leaf: nothing registers.
    assert trie.alphabet == ""
    trie.add_sequence("badabccdaafacb")
    # Leaf explosion registers 'a' (old suffix) then 'b' (new sequence).
    assert trie.alphabet == "ab"
    trie.add_sequence("bcadac")
    assert trie.alphabet == "abc"


def test_sequence_count_tracks_adds_and_pops():
    trie = Trie()
    for read in ("abc", "ab", "abcd"):
        trie.add_sequence(read)
    assert trie.number_of_sequences == 3
    with pytest.raises(LookupError):
        while True:
            trie.pop_cluster(0)
    assert trie.number_of_sequences == 0


def test_raw_stats_and_memory_size_shape():
    trie = Trie(alphabet="ACGTN")
    for read in READS:
        trie.add_sequence(read)
    stats = trie.raw_stats()
    layer_size = len(trie.alphabet) + 1
    assert all(len(row) == layer_size for row in stats)
    assert trie.memory_size() > 0
    from fastqdedup_tpu import trie_stats
    report = trie_stats(trie)
    assert "Total memory usage" in report


def test_stats_after_interleaved_ops():
    trie = Trie()
    trie.add_sequence("AAAA")
    trie.add_sequence("AAAT")
    trie.pop_cluster(1)
    assert trie.number_of_sequences == 0
    trie.add_sequence("CCCC")
    assert trie.number_of_sequences == 1
    assert trie.pop_cluster(1) == [(1, "CCCC")]


def test_query_cache_invalidation_on_mutation():
    """Probe loops reuse cached query state, and mutations invalidate it."""
    trie = Trie()
    trie.add_sequence("AAAA")
    assert trie.contains_sequence("AAAT", 1)
    assert not trie.contains_sequence("CCCC", 1)
    trie.add_sequence("CCCG")              # mutation after a probe
    assert trie.contains_sequence("CCCC", 1)
    trie.pop_cluster(1)                    # removes one cluster
    remaining = trie.number_of_sequences
    assert remaining in (1, 2)
    # Whichever cluster was popped, a probe for its key must now miss.
    assert trie.contains_sequence("AAAA", 0) != \
        trie.contains_sequence("CCCG", 0) or remaining == 0

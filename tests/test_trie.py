"""Trie API parity tests (reference tests/test_trie.py golden cases)."""

import pytest

from fastqdedup_tpu import Trie


def test_one_sequence_fuzzy_contains():
    trie = Trie()
    trie.add_sequence("GATTACA")
    assert trie.contains_sequence("GATTACA", 0)
    assert trie.contains_sequence("AATTACA", 1)
    assert trie.contains_sequence("GATTACC", 1)
    assert trie.contains_sequence("GACCACA", 2)
    assert not trie.contains_sequence("GACCACA", 1)
    assert not trie.contains_sequence("GATTACC", 0)


def test_one_sequence_edit_distance_contains():
    trie = Trie()
    trie.add_sequence("GATTACA")
    assert trie.contains_sequence("GATTACA", 0, use_edit_distance=True)
    assert trie.contains_sequence("AATTACA", 1, use_edit_distance=True)
    assert trie.contains_sequence("GATTACC", 1, use_edit_distance=True)
    assert trie.contains_sequence("GACCACA", 2, use_edit_distance=True)
    assert not trie.contains_sequence("GACCACA", 1, use_edit_distance=True)
    assert not trie.contains_sequence("GATTACC", 0, use_edit_distance=True)
    assert trie.contains_sequence("GATTAA", 1, use_edit_distance=True)
    assert trie.contains_sequence("GATTAC", 1, use_edit_distance=True)
    assert trie.contains_sequence("ATTAC", 2, use_edit_distance=True)


def test_prefix_is_not_membership():
    trie = Trie()
    trie.add_sequence("GATTACA")
    trie.add_sequence("GATTA")
    assert trie.contains_sequence("GATTA")
    assert trie.contains_sequence("GATTACA")
    assert not trie.contains_sequence("GATTAC")


@pytest.mark.parametrize(["sequence", "distance", "result"], [
    ("GATTA", 0, True),
    ("GATTACA", 0, True),
    ("GATTAC", 1, True),
    ("G", 4, True),
    ("GATTAT", 2, True),
    ("UU", 4, False),
    ("UU", 5, True),
    ("UUUUU", 3, False),
    ("ATTAC", 2, True),
])
def test_subsequence_edit_distance(sequence, distance, result):
    trie = Trie()
    trie.add_sequence("GATTACA")
    trie.add_sequence("GATTA")
    assert trie.contains_sequence(
        sequence, distance, use_edit_distance=True) is result


TEST_SEQUENCES = ["AAAA", "AAAA", "AAAC", "AAGC", "AGGC", "CCCG", "CCCG",
                  "TTCA", "TTCC", "TTTA", "TTT", "TTC"]


def test_pop_cluster_hamming_partition():
    trie = Trie()
    for seq in TEST_SEQUENCES:
        trie.add_sequence(seq)
    clusters = []
    while True:
        try:
            clusters.append(set(trie.pop_cluster(1)))
        except LookupError:
            break
    expected = [
        {(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")},
        {(2, "CCCG")},
        {(1, "TTCA"), (1, "TTCC"), (1, "TTTA")},
        {(1, "TTT"), (1, "TTC")},  # Hamming links equal lengths only
    ]
    for cluster in expected:
        assert cluster in clusters
        clusters.remove(cluster)
    assert not clusters


def test_pop_cluster_edit_partition():
    trie = Trie()
    for seq in TEST_SEQUENCES:
        trie.add_sequence(seq)
    clusters = []
    while trie.number_of_sequences:
        clusters.append(set(trie.pop_cluster(1, use_edit_distance=True)))
    expected = [
        {(2, "AAAA"), (1, "AAGC"), (1, "AAAC"), (1, "AGGC")},
        {(2, "CCCG")},
        {(1, "TTCA"), (1, "TTCC"), (1, "TTTA"), (1, "TTT"), (1, "TTC")},
    ]
    for cluster in expected:
        assert cluster in clusters
        clusters.remove(cluster)
    assert not clusters


def test_alphabet_seed():
    trie = Trie(alphabet="acd")
    assert trie.alphabet == "acd"


def test_alphabet_repeated_char():
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


def test_number_of_sequences_bookkeeping():
    trie = Trie()
    trie.add_sequence("abc")
    trie.add_sequence("ab")
    trie.add_sequence("abcd")
    assert trie.number_of_sequences == 3
    while True:
        try:
            trie.pop_cluster(0)
        except LookupError:
            break
    assert trie.number_of_sequences == 0


def test_raw_stats_and_memory_size_shape():
    trie = Trie(alphabet="ACGTN")
    for seq in TEST_SEQUENCES:
        trie.add_sequence(seq)
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
    cluster = trie.pop_cluster(1)
    assert cluster == [(1, "CCCC")]

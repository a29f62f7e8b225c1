"""Cluster dissection golden tests (reference tests/test_fastqdedup.py)."""

import pytest

from fastqdedup_tpu import (
    cluster_dissection_adjacency,
    cluster_dissection_directional,
    cluster_dissection_highest_count,
    length_string_to_slices,
)
from fastqdedup_tpu.dissect import dissect_with_adjacency
from fastqdedup_tpu.distance import within_distance

TEST_CLUSTER = [
    (3, "AAAGT"),   # derived
    (10, "AAAAT"),  # derived
    (50, "AACAA"),  # origin read
    (60, "AAAAA"),  # origin read
    (10, "CAAAA"),  # derived
    (30, "CTAAA"),  # origin read
]

ALL_METHODS = [cluster_dissection_directional,
               cluster_dissection_adjacency,
               cluster_dissection_highest_count]


@pytest.mark.parametrize(["string", "result"], [
    ("5,6,7", [slice(5), slice(6), slice(7)]),
    ("5:8,3,-5:3:-1", [slice(5, 8), slice(3), slice(-5, 3, -1)]),
    ("None:None:16", [slice(None, None, 16)]),
    ("::16", [slice(None, None, 16)]),
])
def test_length_string_to_slices(string, result):
    assert length_string_to_slices(string) == result


def test_highest_count():
    dissected = list(cluster_dissection_highest_count(TEST_CLUSTER))
    assert dissected == ["AAAAA"]


def test_adjacency():
    dissected = set(cluster_dissection_adjacency(TEST_CLUSTER))
    assert dissected == {"AAAAA", "CTAAA", "AAAGT"}


def test_directional():
    dissected = set(cluster_dissection_directional(TEST_CLUSTER))
    assert dissected == {"AACAA", "AAAAA", "CTAAA"}


@pytest.mark.parametrize("function", ALL_METHODS)
def test_input_not_mutated(function):
    cluster = TEST_CLUSTER[:]
    snapshot = cluster[:]
    list(function(cluster))
    assert cluster == snapshot


def test_directional_long_chain():
    # A mutation chain whose count ordering is deliberately misaligned with
    # alphabetical order, plus one member with a count too high to absorb
    # (2*2-1 > 1): both chain origin and that member must be kept.
    cluster = [
        (100, "GGGGGG"),
        (1, "GGGTGG"),
        (1, "GGGTTG"),
        (1, "GGCTTG"),
        (1, "GACTTG"),
        (2, "AACTTG"),
    ]
    dissected = set(cluster_dissection_directional(cluster))
    assert dissected == {"GGGGGG", "AACTTG"}


@pytest.mark.parametrize("function", ALL_METHODS)
def test_single_origin_cluster(function):
    cluster = [(7, "AAAA"), (1, "AAAT"), (1, "CAAA")]
    assert set(function(cluster)) == {"AAAA"}


def _edges_for(cluster, max_distance=1):
    edges = set()
    for i in range(len(cluster)):
        for j in range(i + 1, len(cluster)):
            if within_distance(cluster[i][1], cluster[j][1], max_distance):
                edges.add((i, j))
    return edges


@pytest.mark.parametrize("method", ["highest_count", "adjacency",
                                    "directional"])
def test_dissect_with_adjacency_matches_scalar(method):
    from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS
    for cluster in [TEST_CLUSTER,
                    [(100, "GGGGGG"), (1, "GGGTGG"), (1, "GGGTTG"),
                     (1, "GGCTTG"), (1, "GACTTG"), (2, "AACTTG")],
                    [(7, "AAAA"), (1, "AAAT"), (1, "CAAA")]]:
        expected = set(CLUSTER_DISSECTION_METHODS[method](cluster, 1, False))
        got = set(dissect_with_adjacency(method, cluster,
                                         _edges_for(cluster)))
        assert got == expected


def _directional_literal(cluster, max_distance=1):
    """Literal re-enactment of the reference's directional loop
    (reference __init__.py:60-91): sorted ascending, pop max, absorb into an
    append-while-iterating template list.  Used to property-check that our
    BFS-closure formulation is output-equivalent."""
    items = sorted(cluster)
    kept = []
    while items:
        origin = items.pop()
        templates = [origin]
        for template_count, template_string in templates:
            if not items:
                break
            distinct = []
            for item in items:
                count, string = item
                if (2 * count - 1) <= template_count and within_distance(
                        template_string, string, max_distance):
                    templates.append(item)
                else:
                    distinct.append(item)
            items = distinct
        kept.append(origin[1])
    return kept


def test_directional_matches_literal_reference_loop():
    import random

    rng = random.Random(987)
    for _ in range(120):
        size = rng.randrange(1, 14)
        cluster = [(rng.randrange(1, 9),
                    "".join(rng.choice("ACG") for _ in range(4)))
                   for _ in range(size)]
        expected = _directional_literal(cluster)
        got = list(cluster_dissection_directional(cluster))
        assert sorted(got) == sorted(expected), cluster
        assert got == expected, cluster  # yield order matches too


def test_dissect_randomized_parity():
    """Property test: array/adjacency path == scalar reference semantics."""
    import random

    from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS

    rng = random.Random(1234)
    for trial in range(60):
        size = rng.randrange(2, 12)
        cluster = []
        for _ in range(size):
            seq = "".join(rng.choice("ACGT") for _ in range(5))
            cluster.append((rng.randrange(1, 8), seq))
        for method in ("highest_count", "adjacency", "directional"):
            expected = set(
                CLUSTER_DISSECTION_METHODS[method](cluster, 1, False))
            got = set(dissect_with_adjacency(method, cluster,
                                             _edges_for(cluster)))
            assert got == expected, (method, cluster)


def test_dissect_indices_matches_reference_semantics():
    """The vectorized index path must agree with the oracle-API
    implementation on dense random clusters with count ties."""
    import random

    import numpy as np

    from fastqdedup_tpu.dissect import dissect_indices, dissect_with_adjacency

    rng = random.Random(123)
    for trial in range(30):
        m = rng.randrange(3, 40)
        length = 8
        keys = []
        while len(keys) < m:
            k = "".join(rng.choice("AC") for _ in range(length))
            if k not in keys:
                keys.append(k)
        counts = [rng.randrange(1, 5) for _ in range(m)]
        edges = set()
        for i in range(m):
            for j in range(i + 1, m):
                if sum(a != b for a, b in zip(keys[i], keys[j])) <= 2:
                    edges.add((i, j))
        # Only connected clusters occur in the pipeline; still, the
        # methods are well-defined on any edge set.
        cluster = list(zip(counts, keys))
        ei = np.asarray([e[0] for e in edges], dtype=np.int64)
        ej = np.asarray([e[1] for e in edges], dtype=np.int64)
        rank = np.empty(m, dtype=np.int64)
        rank[np.argsort(np.asarray(keys))] = np.arange(m)
        for method in ("highest_count", "adjacency", "directional"):
            want = set(dissect_with_adjacency(method, cluster, edges))
            got_idx = dissect_indices(
                method, np.asarray(counts, dtype=np.int64), rank, ei, ej)
            got = {keys[i] for i in got_idx}
            assert got == want, (trial, method)


def test_giant_low_complexity_cluster_completes(tmp_path):
    """A pathological low-complexity library (hundreds of near-identical
    keys collapsing into giant clusters) must dissect via the vectorized
    path and match the O(N^2) oracle."""
    import gzip
    import random

    from fastqdedup_tpu.pipeline import deduplicate_cluster

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from oracle import oracle_dedup

    rng = random.Random(7)
    base = "A" * 20
    records = []
    for i in range(2000):
        seq = list(base)
        # 1-2 mutations concentrated in few positions -> one giant cluster
        for _ in range(rng.randrange(0, 3)):
            seq[rng.randrange(4)] = rng.choice("ACGT")
        qual = "I" * 20
        records.append(f"@r{i} x\n{''.join(seq)}\n+\n{qual}\n")
    src = tmp_path / "giant.fastq.gz"
    with gzip.open(src, "wt") as f:
        f.write("".join(records))
    got = tmp_path / "got.fastq.gz"
    exp = tmp_path / "exp.fastq.gz"
    deduplicate_cluster([str(src)], [str(got)], None, 1, 1.0)
    oracle_dedup([str(src)], [str(exp)], None, 1, 1.0)
    assert gzip.open(got, "rb").read() == gzip.open(exp, "rb").read()


def test_batched_dissection_matches_per_cluster():
    """dissect_indices_batched over many concatenated clusters must agree
    with dissect_indices run per cluster, for all methods, including
    count ties and multi-round absorption."""
    import random

    import numpy as np

    from fastqdedup_tpu.dissect import dissect_indices, dissect_indices_batched

    rng = random.Random(321)
    for trial in range(20):
        n_clusters = rng.randrange(1, 30)
        counts_parts, rank_parts, sizes = [], [], []
        eis, ejs = [], []
        offset = 0
        expected = set()
        for _ in range(n_clusters):
            m = rng.randrange(3, 12)
            counts = np.asarray([rng.randrange(1, 6) for _ in range(m)],
                                dtype=np.int64)
            rank = np.asarray(rng.sample(range(m), m), dtype=np.int64)
            edges = set()
            # random connected-ish edges
            for i in range(1, m):
                j = rng.randrange(i)
                edges.add((j, i))
            for _ in range(m):
                a, b = rng.randrange(m), rng.randrange(m)
                if a != b:
                    edges.add((min(a, b), max(a, b)))
            ei = np.asarray([e[0] for e in edges], dtype=np.int64)
            ej = np.asarray([e[1] for e in edges], dtype=np.int64)
            for method in ("highest_count", "adjacency", "directional"):
                pass  # per-method below
            counts_parts.append(counts)
            rank_parts.append(rank)
            sizes.append(m)
            eis.append(ei + offset)
            ejs.append(ej + offset)
            offset += m
        all_counts = np.concatenate(counts_parts)
        all_rank = np.concatenate(rank_parts)
        sizes_arr = np.asarray(sizes, dtype=np.int64)
        bei = np.concatenate(eis)
        bej = np.concatenate(ejs)
        for method in ("highest_count", "adjacency", "directional"):
            kept_b = dissect_indices_batched(
                method, all_counts, all_rank, sizes_arr, bei, bej)
            # per-cluster reference
            expected = np.zeros(offset, dtype=bool)
            start = 0
            for ci, m in enumerate(sizes):
                sel = slice(start, start + m)
                local_e = np.flatnonzero((bei >= start) &
                                         (bei < start + m))
                kept_local = dissect_indices(
                    method, all_counts[sel], all_rank[sel],
                    bei[local_e] - start, bej[local_e] - start)
                expected[start + kept_local] = True
                start += m
            assert (kept_b == expected).all(), (trial, method)

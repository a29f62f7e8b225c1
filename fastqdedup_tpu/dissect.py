"""Cluster dissection: pick representative reads per duplicate cluster.

Implements the three strategies from the UMI-tools paper with the exact
semantics of the reference (/root/reference/src/fastqdedup/__init__.py:60-130):

* ``highest_count`` — keep only the read with the highest count (ties broken
  toward the lexicographically greatest string, via descending tuple sort).
* ``adjacency`` — repeatedly keep the highest-count read and drop every
  remaining read within ``max_distance`` of it.
* ``directional`` — like adjacency, but a read is only absorbed into a
  growing template chain when ``2 * count - 1 <= template_count`` (PCR
  artifact heuristic), and absorbed reads themselves become templates.

The public functions below take ``List[Tuple[count, str]]`` and call a
distance oracle per pair, exactly like the reference API.  The pipeline uses
:func:`dissect_with_adjacency` instead, which consumes a precomputed
adjacency (from the TPU pairwise kernels) and never computes distances.

Key order-independence fact exploited here: the reference's directional
absorption loop (append-while-iterating BFS, __init__.py:78-90) absorbs
exactly the set of reads *reachable* from the origin through directed edges
``u -> v`` with ``2*count(v) - 1 <= count(u)`` and ``dist(u, v) <= d`` among
the reads remaining in that round, so any BFS order yields the same set.
"""

from typing import Callable, Dict, Iterator, List, Sequence, Set, Tuple

from .distance import within_distance

DEFAULT_MAX_DISTANCE = 1

PairOracle = Callable[[int, int], bool]


def _sorted_indices(cluster: Sequence[Tuple[int, str]]) -> List[int]:
    """Indices of ``cluster`` sorted ascending by (count, string)."""
    return sorted(range(len(cluster)), key=lambda i: cluster[i])


def _directional_rounds(
        cluster: Sequence[Tuple[int, str]],
        neighbor_oracle: PairOracle) -> Iterator[int]:
    """Yield origin indices for the directional method.

    ``neighbor_oracle(i, j)`` must answer "within max_distance?" for cluster
    indices i, j.
    """
    order = _sorted_indices(cluster)
    remaining: List[int] = order[:]  # ascending; origin popped from the end
    while remaining:
        origin = remaining.pop()
        origin_count = cluster[origin][0]
        # BFS closure over count-gated edges among the remaining reads.
        absorbed: Set[int] = set()
        frontier: List[Tuple[int, int]] = [(origin_count, origin)]
        while frontier:
            template_count, template = frontier.pop()
            for idx in remaining:
                if idx in absorbed:
                    continue
                count = cluster[idx][0]
                if 2 * count - 1 <= template_count and \
                        neighbor_oracle(template, idx):
                    absorbed.add(idx)
                    frontier.append((count, idx))
        if absorbed:
            remaining = [i for i in remaining if i not in absorbed]
        yield origin


def _adjacency_rounds(
        cluster: Sequence[Tuple[int, str]],
        neighbor_oracle: PairOracle) -> Iterator[int]:
    """Yield kept indices for the adjacency method."""
    remaining = _sorted_indices(cluster)[::-1]  # descending
    while remaining:
        top = remaining[0]
        yield top
        remaining = [i for i in remaining[1:] if not neighbor_oracle(top, i)]


def _scalar_oracle(cluster: Sequence[Tuple[int, str]], max_distance: int,
                   use_edit_distance: bool) -> PairOracle:
    def oracle(i: int, j: int) -> bool:
        return within_distance(cluster[i][1], cluster[j][1],
                               max_distance, use_edit_distance)
    return oracle


def cluster_dissection_directional(cluster: List[Tuple[int, str]],
                                   max_distance: int = DEFAULT_MAX_DISTANCE,
                                   use_edit_distance: bool = False,
                                   ) -> Iterator[str]:
    """Directional method (UMI-tools): count-gated template chains."""
    oracle = _scalar_oracle(cluster, max_distance, use_edit_distance)
    for origin in _directional_rounds(cluster, oracle):
        yield cluster[origin][1]


def cluster_dissection_adjacency(cluster: List[Tuple[int, str]],
                                 max_distance: int = DEFAULT_MAX_DISTANCE,
                                 use_edit_distance: bool = False,
                                 ) -> Iterator[str]:
    """Adjacency method: greedy max-count peeling of direct neighbors."""
    oracle = _scalar_oracle(cluster, max_distance, use_edit_distance)
    for kept in _adjacency_rounds(cluster, oracle):
        yield cluster[kept][1]


def cluster_dissection_highest_count(cluster: List[Tuple[int, str]],
                                     max_distance: int = DEFAULT_MAX_DISTANCE,
                                     use_edit_distance: bool = False,
                                     ) -> Iterator[str]:
    """Keep only the single read with the highest (count, string)."""
    yield max(cluster)[1]


ClusterDissectionFunc = Callable[[List[Tuple[int, str]], int, bool],
                                 Iterator[str]]
CLUSTER_DISSECTION_METHODS: Dict[str, ClusterDissectionFunc] = {
    "highest_count": cluster_dissection_highest_count,
    "adjacency": cluster_dissection_adjacency,
    "directional": cluster_dissection_directional,
}


def dissect_with_adjacency(method: str,
                           cluster: Sequence[Tuple[int, str]],
                           edges: Set[Tuple[int, int]]) -> List[str]:
    """Run a dissection method using a precomputed within-distance relation.

    ``edges`` holds unordered cluster-index pairs (i < j) that are within the
    distance threshold — exactly the pairs produced by the candidate +
    verification kernels, so no per-pair distance is ever recomputed here.
    """
    def oracle(i: int, j: int) -> bool:
        return (i, j) in edges if i < j else (j, i) in edges

    if method == "highest_count":
        return [max(cluster)[1]]
    if method == "adjacency":
        return [cluster[i][1] for i in _adjacency_rounds(cluster, oracle)]
    if method == "directional":
        return [cluster[i][1] for i in _directional_rounds(cluster, oracle)]
    raise ValueError(f"Unknown cluster dissection method: {method}")

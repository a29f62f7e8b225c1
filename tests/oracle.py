"""Slow, obviously-correct re-implementation of the reference pipeline.

Used as the parity oracle for end-to-end tests: same three passes as the
reference driver (/root/reference/src/fastqdedup/__init__.py:209-288) but
with brute-force clustering instead of the trie, and exact keys instead of
Python hashes.  Everything is O(N^2) — test-sized inputs only.
"""

import gzip
from typing import List, Optional

from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS
from fastqdedup_tpu.distance import within_distance
from fastqdedup_tpu.quality import average_error_rate


def _read_fastq(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        lines = [ln.rstrip(b"\r\n").decode("ascii")
                 for ln in f if ln.rstrip(b"\r\n")]
    records = []
    for i in range(0, len(lines), 4):
        records.append((lines[i][1:], lines[i + 1], lines[i + 3]))
    return records


def oracle_dedup(input_files: List[str], output_files: List[str],
                 check_slices: Optional[List[slice]] = None,
                 max_distance: int = 1,
                 max_average_error_rate: float = 0.001,
                 method: str = "directional",
                 use_edit_distance: bool = False) -> None:
    files = [_read_fastq(f) for f in input_files]
    n = min(len(f) for f in files)

    def key_of(i):
        if check_slices:
            return "".join(files[f][i][1][check_slices[f]]
                           for f in range(len(files)))
        return "".join(files[f][i][1] for f in range(len(files)))

    def qual_of(i):
        if check_slices:
            return "".join(files[f][i][2][check_slices[f]]
                           for f in range(len(files)))
        return "".join(files[f][i][2] for f in range(len(files)))

    filter_on_quality = max_average_error_rate < 1.0
    counts = {}
    for i in range(n):
        if filter_on_quality and \
                average_error_rate(qual_of(i)) > max_average_error_rate:
            continue
        key = key_of(i)
        counts[key] = counts.get(key, 0) + 1

    # Brute-force connected components over unique keys.
    keys = list(counts)
    parent = list(range(len(keys)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if within_distance(keys[i], keys[j], max_distance,
                               use_edit_distance):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    clusters = {}
    for i, key in enumerate(keys):
        clusters.setdefault(find(i), []).append((counts[key], key))

    dissect = method if callable(method) \
        else CLUSTER_DISSECTION_METHODS[method]
    kept = set()
    for cluster in clusters.values():
        for key in dissect(cluster, max_distance, use_edit_distance):
            kept.add(key)

    writers = []
    for path in output_files:
        opener = gzip.open if path.endswith(".gz") else open
        writers.append(opener(path, "wb"))
    try:
        for i in range(n):
            key = key_of(i)
            if key in kept:
                kept.remove(key)
                for f, writer in enumerate(writers):
                    name, seq, qual = files[f][i]
                    writer.write(
                        f"@{name}\n{seq}\n+\n{qual}\n".encode("ascii"))
    finally:
        for writer in writers:
            writer.close()

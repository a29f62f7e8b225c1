"""Multi-host helpers (single-process behavior + partition laws)."""

import numpy as np

from fastqdedup_tpu.parallel.distributed import (
    merge_kept_keys,
    partition_buckets_by_hash,
    shard_for_host,
)


def test_shard_for_host_partitions_completely():
    items = list(range(17))
    shards = [shard_for_host(items, process_id=p, num_processes=4)
              for p in range(4)]
    flat = sorted(x for s in shards for x in s)
    assert flat == items
    assert all(len(s) in (4, 5) for s in shards)


def test_shard_for_host_single_process_identity():
    items = ["a.fastq", "b.fastq"]
    assert shard_for_host(items) == items


def test_merge_kept_keys_single_process():
    kept = {b"ACGT", b"TTTT"}
    assert merge_kept_keys(kept) == kept


def test_partition_buckets_by_hash_stable_and_complete():
    keys = [bytes([65 + (i % 26)]) * 3 + bytes([i % 250])
            for i in range(200)]
    shards = partition_buckets_by_hash(keys, 4)
    flat = sorted(i for s in shards for i in s)
    assert flat == list(range(200))
    # Deterministic across calls.
    assert shards == partition_buckets_by_hash(keys, 4)
    # Equal keys always land on the same shard.
    keys2 = [b"same"] * 50
    shards2 = partition_buckets_by_hash(keys2, 8)
    non_empty = [s for s in shards2 if s]
    assert len(non_empty) == 1


def test_bucket_round_robin_multi_device():
    """Bucket batches distribute across local devices and results merge
    identically to single-device execution (8 virtual CPU devices)."""
    import jax

    from fastqdedup_tpu.ops.bucket import hamming_neighbor_pairs_bucketed
    from fastqdedup_tpu.ops.encode import EncodeTable, keys_to_matrix

    assert jax.device_count() >= 2  # conftest forces 8 virtual devices
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, size=(400, 24), dtype=np.uint8)
    matrix = np.repeat(base, 3, axis=0)
    for i in range(0, len(matrix), 3):
        matrix[i + 1, rng.integers(24)] = rng.integers(4)
    ii, jj = hamming_neighbor_pairs_bucketed(matrix, 5, 1)
    want = (matrix[:, None, :] != matrix[None, :, :]).sum(2) <= 1
    wi, wj = np.nonzero(np.triu(want, k=1))
    got = set(zip(ii.tolist(), jj.tolist()))
    assert got == set(zip(wi.tolist(), wj.tolist()))

"""Multi-host initialization and work partitioning.

Greenfield relative to the reference (single-threaded, single-process —
SURVEY.md §2 "Parallelism inventory: none").  Scaling model:

* **multi-chip, one host** — bucket batches round-robin across
  ``jax.local_devices()`` (ops/bucket.py) and the fused dedup step runs
  under shard_map on a 1-D mesh (parallel/sharded.py).  No user action
  needed.
* **multi-host pods** — call :func:`initialize_distributed` first (or set
  the standard JAX coordinator env vars); each host ingests its own input
  shard (`shard_for_host`), computes candidate pairs for the bucket
  subsets it owns, and the kept-key sets merge host-side.

Tested on virtual CPU device meshes
(`XLA_FLAGS=--xla_force_host_platform_device_count=N`); see
tests/test_parallel.py and the driver's dryrun_multichip hook.
"""

from typing import List, Optional, Sequence, Tuple


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (idempotent; no-op when single-process).

    With no arguments, relies on JAX's standard auto-detection (GKE/TPU-VM
    metadata or the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        # Already initialized (or single-process context) — both fine.
        pass


def shard_for_host(items: Sequence, process_id: Optional[int] = None,
                   num_processes: Optional[int] = None) -> List:
    """The subset of ``items`` this host owns (strided partition)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    return [item for index, item in enumerate(items)
            if index % nproc == pid]


def merge_kept_keys(local_kept: set) -> set:
    """Union the per-host kept-key sets across processes.

    Keys are small byte strings; the merge runs over the JAX distributed
    client as fixed-width device arrays (an all-gather over DCN), falling
    back to the local set in single-process runs.
    """
    import jax

    if jax.process_count() == 1:
        return local_kept
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    local = sorted(local_kept)
    max_len = max((len(k) for k in local), default=0)
    max_len = int(multihost_utils.process_allgather(
        jnp.asarray(max_len)).max())
    count = len(local)
    max_count = int(multihost_utils.process_allgather(
        jnp.asarray(count)).max())
    buf = np.zeros((max_count, max(max_len, 1)), dtype=np.uint8)
    # Lengths travel as a separate int32 vector (keys can exceed 255
    # bytes, e.g. paired 150 bp concatenations); -1 marks empty slots so
    # genuine zero-length keys survive the merge.
    lens = np.full(max_count, -1, dtype=np.int32)
    for i, key in enumerate(local):
        lens[i] = len(key)
        buf[i, :len(key)] = np.frombuffer(key, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(buf)))
    gathered_lens = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(lens)))
    merged = set()
    for host_buf, host_lens in zip(gathered, gathered_lens):
        for row, key_len in zip(host_buf, host_lens):
            if key_len >= 0:
                merged.add(row[:key_len].tobytes())
    return merged


def partition_buckets_by_hash(bucket_keys: Sequence[bytes],
                              num_shards: int) -> List[List[int]]:
    """Assign bucket ids to shards by stable content hash.

    Buckets are the unit of distribution (a bucket's pairs never cross
    hosts for Hamming — SURVEY.md §7 step 9), so this partition makes the
    candidate-generation phase embarrassingly parallel across hosts.
    """
    import zlib

    shards: List[List[int]] = [[] for _ in range(num_shards)]
    for index, key in enumerate(bucket_keys):
        shards[zlib.crc32(key) % num_shards].append(index)
    return shards

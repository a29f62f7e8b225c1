"""Multi-device sharded clustering (Mesh + shard_map + collectives).

Greenfield relative to the reference (single-threaded CPU, SURVEY.md
section 2): the key matrix is sharded row-wise over a 1-D device mesh; each
device computes its adjacency slab against the full key set with the MXU
one-hot matmul, and component labels converge through all-gather rounds over
ICI (min-label propagation with pointer doubling).  Communication per round
is one [N] int32 all-gather — the adjacency never leaves the devices.

This module is also the dryrun_multichip surface: the driver compiles it on
an N-virtual-device CPU mesh to validate the sharding program.
"""

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def _sharded_dedup_fn(mesh: Mesh, alphabet_size: int, max_distance: int):
    """Build the shard_map'd (matrix, counts, rank) -> (labels, keep) fn."""
    from ..ops.hamming import pairwise_within

    def per_shard(matrix_shard, counts, rank):
        # matrix_shard: [N/D, L]; counts/rank: [N] replicated.
        n = counts.shape[0]
        block = matrix_shard.shape[0]
        my = jax.lax.axis_index(AXIS)
        base = my * block
        # Rebuild the full key set once (tiled all-gather over ICI), then
        # compute this device's adjacency slab on the MXU.
        full = jax.lax.all_gather(matrix_shard, AXIS, tiled=True)
        adj = pairwise_within(matrix_shard, full, alphabet_size,
                              max_distance)  # [N/D, N]
        labels0 = jnp.arange(n, dtype=jnp.int32)

        def step(state):
            labels, _ = state
            neighbor_min = jnp.min(
                jnp.where(adj, labels[None, :], jnp.int32(n)), axis=1)
            my_block = jax.lax.dynamic_slice(labels, (base,), (block,))
            new_block = jnp.minimum(my_block, neighbor_min)
            new = jax.lax.all_gather(new_block, AXIS, tiled=True)
            new = new[new]
            new = new[new]
            return new, jnp.any(new != labels)

        # Mark the carry as device-varying for shard_map's vma type system
        # (the all_gather inside the loop produces varying-typed values).
        init = (jax.lax.pvary(labels0, (AXIS,)),
                jax.lax.pvary(jnp.array(True), (AXIS,)))
        labels, _ = jax.lax.while_loop(lambda s: s[1], step, init)

        # Representative pick (highest count, rank tie-break), replicated.
        max_count = jnp.zeros(n, jnp.int32).at[labels].max(
            counts.astype(jnp.int32))
        is_max = counts.astype(jnp.int32) == max_count[labels]
        best_rank = jnp.full(n, -1, jnp.int32).at[labels].max(
            jnp.where(is_max, rank.astype(jnp.int32), -1))
        keep = is_max & (rank.astype(jnp.int32) == best_rank[labels])
        return labels, keep

    # Outputs are replicated by construction (every device ends with the
    # same all-gathered labels); vma inference can't prove it, so disable
    # the static check.
    return shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)


def sharded_dedup_step(matrix: np.ndarray, counts: np.ndarray,
                       rank: np.ndarray, alphabet_size: int,
                       max_distance: int,
                       mesh: Optional[Mesh] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster labels + highest-count representatives on a device mesh.

    Pads N up to a multiple of the mesh size (padding keys are all-sentinel,
    match nothing, and are dropped from the result).
    """
    if mesh is None:
        mesh = make_mesh()
    n_shards = mesh.devices.size
    n, length = matrix.shape
    padded_n = max(_round_up(n, n_shards), n_shards)
    if padded_n != n:
        pad = padded_n - n
        matrix = np.concatenate(
            [matrix, np.full((pad, length), 0xFF, dtype=matrix.dtype)])
        counts = np.concatenate([counts, np.zeros(pad, counts.dtype)])
        rank = np.concatenate([rank, np.zeros(pad, rank.dtype)])
    fn = jax.jit(_sharded_dedup_fn(mesh, alphabet_size, max_distance))
    sharding = NamedSharding(mesh, P(AXIS, None))
    matrix_dev = jax.device_put(jnp.asarray(matrix), sharding)
    replicated = NamedSharding(mesh, P())
    counts_dev = jax.device_put(jnp.asarray(counts, jnp.int32), replicated)
    rank_dev = jax.device_put(jnp.asarray(rank, jnp.int32), replicated)
    labels, keep = fn(matrix_dev, counts_dev, rank_dev)
    return np.asarray(labels)[:n], np.asarray(keep)[:n]

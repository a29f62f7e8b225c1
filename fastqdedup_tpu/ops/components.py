"""Connected components over the within-distance pair graph.

The reference's ``Trie.pop_cluster`` (_triemodule.c:778-897) extracts one
connected component of the "within distance d" relation per call via a BFS of
trie walks.  Here the whole partition is computed at once:

* :func:`connected_components_host` — weighted-ish union-find with path
  halving over the edge list (numpy-backed, O(E alpha(N))).  Used by the
  single-host pipeline where edge lists are sparse.
* :func:`connected_components_device` — jittable min-label propagation with
  pointer doubling, used inside the sharded multi-device pipeline where the
  labels live on device and merge via collectives.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


def connected_components_host(n: int, pairs_i: np.ndarray,
                              pairs_j: np.ndarray) -> np.ndarray:
    """Component label (smallest member index) per node, int64 [n].

    Native C union-find (path halving, min-index roots; ~100M edges/s,
    GIL-free) when the native library is available; otherwise vectorized
    min-label propagation with pointer doubling — each sweep is a
    handful of O(E)/O(N) numpy ops, O(log N) sweeps.
    """
    labels = np.arange(n, dtype=np.int64)
    if not len(pairs_i):
        return labels
    try:
        from ..native.loader import union_find_native
        return union_find_native(n, pairs_i, pairs_j)
    except ImportError:
        pass
    while True:
        prev = labels
        m = labels.copy()
        np.minimum.at(m, pairs_i, labels[pairs_j])
        np.minimum.at(m, pairs_j, labels[pairs_i])
        # Pointer doubling: chase labels toward the component minimum.
        m = m[m]
        m = m[m]
        if np.array_equal(m, prev):
            return m
        labels = m


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def connected_components_device(edges: jax.Array, edge_mask: jax.Array,
                                num_nodes: int) -> jax.Array:
    """Min-label propagation over a padded edge list.

    ``edges``: int32 [E, 2]; ``edge_mask``: bool [E] (False rows ignored).
    Returns int32 labels [num_nodes] where each label is the smallest node
    index in the component.  Converges via a while_loop alternating
    scatter-min edge relaxation with pointer doubling (hooking +
    shortcutting), O(log N) iterations.
    """
    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)
    big = jnp.int32(num_nodes)
    src = jnp.where(edge_mask, edges[:, 0], big - 1)
    dst = jnp.where(edge_mask, edges[:, 1], big - 1)

    def step(state):
        labels, _ = state
        lsrc = labels[src]
        ldst = labels[dst]
        lmin = jnp.minimum(lsrc, ldst)
        new = labels.at[src].min(lmin).at[dst].min(lmin)
        # Pointer doubling: label[i] <- label[label[i]] (idempotent chase).
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, step, (labels0, jnp.array(True)))
    return labels

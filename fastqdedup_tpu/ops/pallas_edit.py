"""Pallas TPU kernel: banded Levenshtein "within distance" verification.

The reference tests edit distance with a branch-and-bound recursion
(/root/reference/src/fastqdedup/distances.h:33-88).  The dense TPU
formulation is a banded dynamic program: for ``lev(a, b) <= d`` only the
diagonal band ``|i - j| <= d`` of the DP matrix matters, so the kernel
carries a band of width ``W = 2d + 1`` per pair through a scan over the
rows of the edit matrix — O(L * W) VPU work per pair instead of O(L^2),
with the W-step in-row dependency unrolled statically (W is 3 or 5 in
practice).

Layout: pairs live on the LANE dimension (minor), the scanned string
position on the sublane dimension — Mosaic only supports dynamic indexing
off the minor dimension, so operands arrive transposed as int32 [L, P] and
every DP value is a [1, P] lane vector.

Band coordinates: ``band[k]`` holds ``dp[i][j]`` with ``j = i - d + k``;
moving from row i-1 to i, the diagonal (substitution) predecessor keeps
index k, deletion (dp[i-1][j]) is k+1, insertion (dp[i][j-1]) is k-1.

Semantics pinned by the reference's truth table
(tests/test__distance.py:37-60), via the same test oracle as
:func:`fastqdedup_tpu.ops.edit.batched_edit_distance`.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pairs per grid step (lane dimension; multiple of 128).
PAIR_BLOCK = 512

_INF = 1 << 20  # plain int: jnp constants may not be captured by kernels


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _banded_body(a_ref, la_ref, b_ref, lb_ref, out_ref, *,
                 max_distance: int, length: int):
    """out[0, p] = lev(a_p[:la_p], b_p[:lb_p]) <= max_distance.

    a/b: int32 [L, PAIR_BLOCK] transposed character columns (padding
    arbitrary); la/lb: int32 [1, PAIR_BLOCK] valid lengths.
    """
    d = max_distance
    w = 2 * d + 1
    la = la_ref[:]  # [1, P]
    lb = lb_ref[:]

    # Band init (row 0): dp[0][j] = j at k = j + d.
    init_rows = []
    for k in range(w):
        j = k - d
        init_rows.append(jnp.full_like(la, j if j >= 0 else _INF))
    band = jnp.concatenate(init_rows, axis=0)  # [W, P] int32

    # result for la == 0: lb <= d.
    result = jnp.where(la == 0, lb, jnp.full_like(la, _INF))  # [1, P]

    def row(i, carry):
        band, result = carry
        ai = a_ref[pl.ds(i - 1, 1), :]  # [1, P] int32
        rows = []
        left = None  # insertion predecessor dp[i][j-1]
        for k in range(w):
            j = i - d + k  # traced scalar, same for every pair
            jc = jnp.clip(j - 1, 0, length - 1)
            bij = b_ref[pl.ds(jc, 1), :]  # [1, P]
            sub_cost = jnp.where(ai == bij, 0, 1)
            best = band[k:k + 1, :] + sub_cost          # diagonal
            if k + 1 < w:
                best = jnp.minimum(best, band[k + 1:k + 2, :] + 1)  # delete
            if left is not None:
                best = jnp.minimum(best, left + 1)       # insert
            # Cells outside [1, lb] (or j < 1) are invalid.
            invalid = (j < 1) | (j > lb)
            best = jnp.where(invalid, jnp.full_like(best, _INF), best)
            # dp[i][0] = i lives on the left band edge where j == 0.
            best = jnp.where(j == 0, jnp.full_like(best, 1) * i, best)
            left = best
            rows.append(best)
        band = jnp.concatenate(rows, axis=0)
        # Capture dp[la][lb] as the scan passes i == la: its band index is
        # lb - la + d, selected with a static-W masked fold.
        target_k = lb - la + d  # [1, P]
        gathered = jnp.full_like(result, _INF)
        for k in range(w):
            gathered = jnp.where(target_k == k, band[k:k + 1, :], gathered)
        result = jnp.where(la == i, gathered, result)
        return band, result

    _, result = jax.lax.fori_loop(1, length + 1, row, (band, result))
    out_ref[:] = result <= d


@functools.partial(jax.jit, static_argnames=("max_distance",))
def banded_within_edit_distance(a: jax.Array, len_a: jax.Array,
                                b: jax.Array, len_b: jax.Array,
                                max_distance: int) -> jax.Array:
    """bool [P, 1]: lev(a_p, b_p) <= max_distance, banded Pallas kernel.

    ``a``/``b``: uint8 [P, L]; ``len_a``/``len_b``: int32 [P].  P must be a
    multiple of PAIR_BLOCK (callers pad; padded rows may hold anything).
    Pairs with |len_a - len_b| > max_distance are False by construction
    (their target cell stays outside the band).
    """
    p, length = a.shape
    a_t = jnp.transpose(a.astype(jnp.int32))  # [L, P]
    b_t = jnp.transpose(b.astype(jnp.int32))
    la = len_a.reshape(1, -1).astype(jnp.int32)
    lb = len_b.reshape(1, -1).astype(jnp.int32)
    kernel = functools.partial(_banded_body, max_distance=max_distance,
                               length=length)
    out = pl.pallas_call(
        kernel,
        grid=(p // PAIR_BLOCK,),
        in_specs=[
            pl.BlockSpec((length, PAIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, PAIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PAIR_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.bool_),
        interpret=_interpret(),
    )(a_t, la, b_t, lb)
    return jnp.transpose(out)  # [P, 1]

"""Pallas TPU kernel: banded Levenshtein "within distance" verification.

The reference tests edit distance with a branch-and-bound recursion
(/root/reference/src/fastqdedup/distances.h:33-88).  The dense TPU
formulation is a banded dynamic program: for ``lev(a, b) <= d`` only the
diagonal band ``|i - j| <= d`` of the DP matrix matters, so the kernel
carries a band of width ``W = 2d + 1`` per pair through a scan over the
rows of the edit matrix — O(L * W) VPU work per pair instead of O(L^2),
with the W-step in-row dependency unrolled statically (W is 3 or 5 in
practice).

Layout: pairs live on the two MINOR dimensions — each program's block of
``PAIR_BLOCK`` pairs is folded to [8 sublanes, PAIR_BLOCK/8 lanes], so a
DP value is a [1, 8, P/8] tensor that fills whole 8x128 VPU registers.
(The earlier [1, P] lane-vector layout left 7 of 8 sublanes idle — 12.5%
VPU occupancy on every band op.)  The scanned string position stays on
the major dimension, dynamically indexed per row.

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

# Pairs per grid step, folded to [8, PAIR_BLOCK // 8] on the two minor
# dimensions (must be a multiple of 8 * 128).
PAIR_BLOCK = 4096

_INF = 1 << 20  # plain int: jnp constants may not be captured by kernels


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _banded_body(a_ref, la_ref, b_ref, lb_ref, out_ref, *,
                 max_distance: int, length: int):
    """out[0, s, l] = lev(a_p[:la_p], b_p[:lb_p]) <= max_distance for the
    pair p folded at (sublane s, lane l).

    a/b: int32 [L, 8, PAIR_BLOCK/8] transposed character planes (padding
    arbitrary); la/lb: int32 [1, 8, PAIR_BLOCK/8] valid lengths.
    """
    d = max_distance
    w = 2 * d + 1
    la = la_ref[:]  # [1, 8, P/8]
    lb = lb_ref[:]

    # Band init (row 0): dp[0][j] = j at k = j + d.
    init_rows = []
    for k in range(w):
        j = k - d
        init_rows.append(jnp.full_like(la, j if j >= 0 else _INF))
    band = jnp.concatenate(init_rows, axis=0)  # [W, 8, P/8] int32

    # result for la == 0: lb <= d.
    result = jnp.where(la == 0, lb, jnp.full_like(la, _INF))

    def row(i, carry):
        band, result = carry
        ai = a_ref[pl.ds(i - 1, 1), :, :]  # [1, 8, P/8] int32
        rows = []
        left = None  # insertion predecessor dp[i][j-1]
        for k in range(w):
            j = i - d + k  # traced scalar, same for every pair
            jc = jnp.clip(j - 1, 0, length - 1)
            bij = b_ref[pl.ds(jc, 1), :, :]  # [1, 8, P/8]
            sub_cost = jnp.where(ai == bij, 0, 1)
            best = band[k:k + 1] + sub_cost              # diagonal
            if k + 1 < w:
                best = jnp.minimum(best, band[k + 1:k + 2] + 1)  # delete
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
        target_k = lb - la + d  # [1, 8, P/8]
        gathered = jnp.full_like(result, _INF)
        for k in range(w):
            gathered = jnp.where(target_k == k, band[k:k + 1], gathered)
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
    # Fold pairs to [8 sublanes, p/8 lanes]: pair p <-> (p // (p_tot/8)...)
    # — the exact fold order is irrelevant as long as inputs and output
    # use the same reshape (row-major here).
    cols = p // 8
    a_t = jnp.transpose(a.astype(jnp.int32)).reshape(length, 8, cols)
    b_t = jnp.transpose(b.astype(jnp.int32)).reshape(length, 8, cols)
    la = len_a.astype(jnp.int32).reshape(1, 8, cols)
    lb = len_b.astype(jnp.int32).reshape(1, 8, cols)
    block_cols = PAIR_BLOCK // 8
    kernel = functools.partial(_banded_body, max_distance=max_distance,
                               length=length)
    out = pl.pallas_call(
        kernel,
        grid=(p // PAIR_BLOCK,),
        in_specs=[
            pl.BlockSpec((length, 8, block_cols), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_cols), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, 8, block_cols), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_cols), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, block_cols), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, p // 8), jnp.bool_),
        interpret=_interpret(),
    )(a_t, la, b_t, lb)
    return out.reshape(1, p).T  # [P, 1]

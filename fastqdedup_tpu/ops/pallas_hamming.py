"""Pallas TPU kernels for Hamming distance.

Two kernels replace the reference's scalar distance predicates
(/root/reference/src/fastqdedup/distances.h:8-31) on the TPU compute units:

* :func:`within_tile_kernel` — all-pairs ``Hamming(a_i, b_j) <= d`` boolean
  tile.  Fuses the one-hot expansion (VPU), the match-count contraction
  (MXU systolic array), and the distance threshold into one kernel, so
  neither the int8 one-hot operands nor the int32 [N, M] match-count matrix
  ever round-trips through HBM — the only HBM traffic is the uint8 index
  tiles in and the packed bool tile out.
* :func:`rowwise_within_packed` — paired-row verification over 4-bit-packed
  uint32 lanes: XOR + nibble-collapse + population count on the VPU.  This
  is the pigeonhole-candidate verification hot path (8 bases per uint32
  lane, ~6 VPU ops per lane per pair).

Both kernels run compiled on TPU and fall back to interpreter mode on CPU
(tests / virtual-device meshes), keeping one code path.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile of the all-pairs kernel; 128 matches the MXU systolic array.
TILE_M = 128
TILE_N = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------- #
# All-pairs tile kernel (one-hot -> MXU -> threshold, fused)


_PAD_SYMBOL = 0xFF  # outside every padded alphabet: one-hot row all-zero


def _pad_dims(length: int, alphabet_size: int) -> Tuple[int, int]:
    """Canonical padded (length, alphabet) so ONE compiled kernel covers
    every real (L, A, d) configuration (cold Mosaic compiles through a
    remote TPU take minutes; real length/distance arrive as scalars).

    The one-hot rank is the EXACT alphabet size for the canonical DNA
    alphabet (ACGTN -> 5): a match count over A symbols is information-
    theoretically rank-A, so channels beyond A are pure MXU waste — the
    previous power-of-two padding (8 for DNA) burned 1.6x redundant
    contraction work.  Exotic alphabets round up to multiples of 4 to
    bound the number of compiled kernel variants."""
    if alphabet_size <= 5:
        a_pad = 5
    else:
        a_pad = -(-alphabet_size // 4) * 4
    # Never reach 256: _PAD_SYMBOL (0xFF) must stay out of range so padding
    # one-hots to all-zero.  EncodeTable caps alphabets at 254 symbols.
    a_pad = min(a_pad, 255)
    l_pad = max(-(-length // 16) * 16, 16)
    return l_pad, a_pad


def _within_tile_body(scal_ref, sym_ref, pack_ref, a_ref, b_ref, out_ref,
                      a_oh_ref, b_oh_ref, *, alphabet_pad: int):
    """out[i, c] = bitpacked (length - matches(a_i, b_j)) <= max_distance
    for j in [8c, 8c+8), little bit order.

    ``a_ref``: uint8 [N, Lp] alphabet indices padded with _PAD_SYMBOL;
    ``b_ref``: uint8 [M, Lp].  Any index >= the padded alphabet size
    one-hots to an all-zero row and matches nothing (padding rows AND
    padding columns), so match counts cover exactly the real positions.

    ``scal_ref``: int32 [1, 2] = (real length, max_distance) in SMEM —
    runtime scalars, not compile-time constants, so one compiled kernel
    serves every length/distance at this padded geometry.

    ``sym_ref``: int32 [1, Lp*Ap] precomputed symbol pattern.  One-hot is
    built on the VPU: pltpu.repeat tiles an index row Ap times along
    the lane dimension (copy-concatenation), so at flat column
    t = c*Lp + k the value is index[k]; the pattern
    sym[t] = (c + k) % Ap visits every symbol exactly once per position k
    as the copy c varies, hence sum_t [a==sym][b==sym] == sum_k [a_k==b_k].

    The one-hot operands are expanded ONCE, at grid step 0, into VMEM
    scratch that persists across the (sequential) grid — per program only
    the MXU contractions remain.  Expanding per program left the MXU at
    ~6% utilization: the VPU rebuild of the full [M, Lp*Ap] operand cost
    ~10x the 128-row matmul it fed.  The expansion walks 128-row slabs so
    the int compare intermediates stay register-sized.
    """
    i = pl.program_id(0)
    sym = sym_ref[:]

    @pl.when(i == 0)
    def _expand():
        def slab(src_ref, dst_ref):
            def body(s, carry):
                # int32 compare: Mosaic has no 8-bit vector cmpi.
                rows = src_ref[pl.ds(s * TILE_M, TILE_M), :].astype(
                    jnp.int32)
                rep = pltpu.repeat(rows, alphabet_pad, axis=1)
                dst_ref[pl.ds(s * TILE_M, TILE_M), :] = \
                    (rep == sym).astype(jnp.int8)
                return carry
            jax.lax.fori_loop(0, src_ref.shape[0] // TILE_M, body, 0)

        slab(a_ref, a_oh_ref)
        slab(b_ref, b_oh_ref)

    length = scal_ref[0, 0]
    max_distance = scal_ref[0, 1]
    # Match counts on the MXU: [TILE_M, E] x [M, E]^T -> int32.
    matches = jax.lax.dot_general(
        a_oh_ref[pl.ds(i * TILE_M, TILE_M), :], b_oh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    within = ((length - matches) <= max_distance).astype(jnp.int8)
    # Bitpack 8 adjacent columns into one byte with a second MXU pass:
    # pack[j, c] = (1 << (j % 8)) when j // 8 == c.  Bit 7's weight is -128
    # in int8, but the int32 row sums are exact and truncate back to the
    # intended byte pattern (each bit contributes a distinct +/- power of
    # two).  The packed tile is 8x smaller on the wire — D2H bandwidth
    # through a tunneled TPU is the bottleneck, not compute.
    packed = jax.lax.dot_general(
        within, pack_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = packed.astype(jnp.uint8)


def within_tile_packed(a, b, alphabet_size: int,
                       max_distance: int) -> jax.Array:
    """uint8 [N, M//8]: bitpacked all-pairs Hamming <= max_distance
    (little bit order along columns) via the fused Pallas kernel.  N and M
    must be multiples of 128 (callers pad; see
    fastqdedup_tpu.ops.hamming.neighbor_pairs).

    Real length and max_distance travel as runtime scalars; the compiled
    executable is keyed only on the canonical padded geometry, so all
    (L, A, d) configurations share one cold compile."""
    import numpy as np

    length = a.shape[1]
    l_pad, a_pad = _pad_dims(length, alphabet_size)
    a = np.pad(np.asarray(a), ((0, 0), (0, l_pad - length)),
               constant_values=_PAD_SYMBOL)
    b = np.pad(np.asarray(b), ((0, 0), (0, l_pad - length)),
               constant_values=_PAD_SYMBOL)
    scalars = np.array([[length, max_distance]], dtype=np.int32)
    return _within_tile_padded(scalars, a, b, a_pad)


def unpack_within(packed: "jax.Array") -> "jax.Array":
    """Host-side expansion of the bitpacked tile to bool [N, M]."""
    import numpy as np

    arr = np.asarray(packed)
    return np.unpackbits(arr, axis=1, bitorder="little").astype(bool)


def within_tile_kernel(a, b, alphabet_size: int,
                       max_distance: int):
    """bool [N, M] all-pairs within-distance (unpacked convenience API)."""
    return unpack_within(within_tile_packed(a, b, alphabet_size,
                                            max_distance))


@functools.partial(jax.jit, static_argnames=("alphabet_pad",))
def _within_tile_padded(scalars: jax.Array, a: jax.Array, b: jax.Array,
                        alphabet_pad: int) -> jax.Array:
    n, l_pad = a.shape
    m = b.shape[0]
    a_pad = alphabet_pad
    expanded = l_pad * a_pad
    kernel = functools.partial(_within_tile_body, alphabet_pad=a_pad)
    pos = jnp.arange(expanded, dtype=jnp.int32)
    sym = ((pos // l_pad + pos % l_pad) % a_pad).reshape(1, -1)
    pack = _bit_pack_matrix(m)
    # 1-D grid: each program contracts its TILE_M-row slab of the a one-hot
    # against the FULL b one-hot and writes a full-width packed row block
    # (the packed minor dim m//8 must be a whole block — Mosaic requires
    # block minor dims to be 128-divisible or full).  The index operands
    # and the one-hot scratch use constant index maps, so they are
    # fetched/expanded once and stay VMEM-resident across the grid.
    grid = (n // TILE_M,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, expanded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m // 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, m // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m // 8), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((n, expanded), jnp.int8),
            pltpu.VMEM((m, expanded), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * (l_pad * a_pad + m // 8),
            bytes_accessed=(n + m) * l_pad + n * m // 8,
            transcendentals=0),
        interpret=_interpret(),
    )(scalars, sym, pack, a, b)


# --------------------------------------------------------------------- #
# Bucketed per-bucket all-pairs tile kernel


def _bucket_tile_body(scal_ref, sym_ref, pack_ref, batch_ref, out_ref,
                      oh_ref, *, alphabet_pad: int):
    """Per-bucket all-pairs within-distance, bitpacked.

    Grid is (K buckets, S // TILE_M row slabs); the row-slab dimension is
    innermost, so for each bucket the one-hot operand is expanded ONCE
    (at slab 0) into VMEM scratch and every slab's MXU contraction reads
    it back — the XLA batched-matmul formulation this replaces spent
    most of its time re-materializing one-hots and ran the MXU at <14%
    (S=2048) down to <1% (S=128).
    """
    j = pl.program_id(1)
    sym = sym_ref[:]

    @pl.when(j == 0)
    def _expand():
        def body(s, carry):
            # int32 compare: Mosaic has no 8-bit vector cmpi.
            rows = batch_ref[0, pl.ds(s * TILE_M, TILE_M), :].astype(
                jnp.int32)
            rep = pltpu.repeat(rows, alphabet_pad, axis=1)
            oh_ref[pl.ds(s * TILE_M, TILE_M), :] = \
                (rep == sym).astype(jnp.int8)
            return carry
        jax.lax.fori_loop(0, batch_ref.shape[1] // TILE_M, body, 0)

    length = scal_ref[0, 0]
    max_distance = scal_ref[0, 1]
    matches = jax.lax.dot_general(
        oh_ref[pl.ds(j * TILE_M, TILE_M), :], oh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    within = ((length - matches) <= max_distance).astype(jnp.int8)
    packed = jax.lax.dot_general(
        within, pack_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[0] = packed.astype(jnp.uint8)


def _bucket_group_body(scal_ref, sym_ref, pack_ref, batch_ref, out_ref,
                       *, alphabet_pad: int, group: int):
    """All-pairs within-distance for GROUP single-slab (S == TILE_M)
    buckets per grid program.

    At S = 128 each bucket is one expansion + one [128, E] x [E, 128]
    contraction — microseconds of MXU time — so a grid program per bucket
    drowns in per-program overhead (measured: K = 2048 programs ran the
    class at 9% of MXU peak while S = 2048 hit 46%).  Grouping GROUP
    buckets into one program amortizes that overhead GROUP-fold.
    """
    length = scal_ref[0, 0]
    max_distance = scal_ref[0, 1]
    sym = sym_ref[:]

    # One BATCHED expansion + contraction for the whole group: the
    # per-iteration fori_loop overhead (dynamic slab index, per-bucket
    # dot setup) was this class's binding constraint — measured 10.0%
    # of MXU peak looped vs batched (BASELINE.md round-5 class table).
    # VMEM: the [G, S, E] int8 one-hot is ~1.1 MB at G=16, E=560.
    rows = batch_ref[:].astype(jnp.int32)                 # [G, S, Lp]
    oh = (pltpu.repeat(rows, alphabet_pad, axis=2)
          == sym.reshape(1, 1, -1)).astype(jnp.int8)      # [G, S, E]
    matches = jax.lax.dot_general(
        oh, oh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                 # [G, S, S]
    within = ((length - matches) <= max_distance).astype(jnp.int8)
    packed = jax.lax.dot_general(
        within, pack_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                 # [G, S, S//8]
    out_ref[:] = packed.astype(jnp.uint8)


# Buckets folded into one grid program for the single-slab size class.
# Upper bound; the actual group adapts to the geometry's VMEM footprint.
_BUCKET_GROUP = 64


def _bucket_group(l_pad: int, alphabet_pad: int) -> int:
    """Buckets per grid program for the S=128 class, from VMEM budget.

    The batched one-hot [G, S, E] int8 and the [G, S, S] int32 match
    tensor dominate; ~12 MB of the ~16 MB VMEM keeps headroom for the
    batch/output blocks and Mosaic temporaries.  Larger G amortizes
    per-program overhead (measured 10.0% -> 27.1% of MXU peak at
    L=100/A=5 going from per-bucket loops to G=64 batched)."""
    e = l_pad * alphabet_pad
    per_bucket = TILE_M * e + TILE_M * TILE_M * 4 \
        + TILE_M * (l_pad + TILE_M // 8 + TILE_M)
    budget = (12 << 20) // max(per_bucket, 1)
    for cand in (64, 32, 16, 8):
        if budget >= cand:
            return cand
    return 8


def _bit_pack_matrix(m: int) -> "jax.Array":
    """int8 [m, m//8] matrix P with P[j, c] = (1 << (j % 8)) iff j//8 == c;
    a dot with it packs 8 boolean columns per byte (little bit order).
    Bit 7's int8 weight is -128 — exact after int32 accumulate + uint8
    truncation."""
    col = jnp.arange(m, dtype=jnp.int32)
    weight = jnp.left_shift(jnp.int32(1), col % 8)
    weight = jnp.where(col % 8 == 7, -128, weight).astype(jnp.int8)
    return jnp.where((col[:, None] // 8) ==
                     jnp.arange(m // 8, dtype=jnp.int32)[None, :],
                     weight[:, None], 0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("alphabet_pad",))
def bucket_within_packed(batch: jax.Array, scalars: jax.Array,
                         alphabet_pad: int) -> jax.Array:
    """uint8 [K, S, S//8]: per-bucket all-pairs Hamming <= max_distance,
    bitpacked along the last axis (little bit order).

    ``batch``: uint8 [K, S, Lp] alphabet indices with _PAD_SYMBOL padding
    (pad rows/columns one-hot to zero and match nothing); S must be a
    multiple of 128.  ``scalars``: int32 [1, 2] = (real length,
    max_distance) — runtime values, so one compiled executable per
    (K, S, Lp, Ap) geometry serves every length/distance."""
    k, s, l_pad = batch.shape
    expanded = l_pad * alphabet_pad
    pos = jnp.arange(expanded, dtype=jnp.int32)
    sym = ((pos // l_pad + pos % l_pad) % alphabet_pad).reshape(1, -1)
    pack = _bit_pack_matrix(s)
    group = _bucket_group(l_pad, alphabet_pad)
    if s == TILE_M and k % group == 0:
        grouped = functools.partial(_bucket_group_body,
                                    alphabet_pad=alphabet_pad,
                                    group=group)
        return pl.pallas_call(
            grouped,
            grid=(k // group,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, expanded), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s, s // 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, s, l_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, s, s // 8),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, s, s // 8), jnp.uint8),
            cost_estimate=pl.CostEstimate(
                flops=2 * k * s * s * (expanded + s // 8),
                bytes_accessed=k * s * (l_pad + s // 8),
                transcendentals=0),
            interpret=_interpret(),
        )(scalars, sym, pack, batch)
    kernel = functools.partial(_bucket_tile_body, alphabet_pad=alphabet_pad)
    return pl.pallas_call(
        kernel,
        grid=(k, s // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, expanded), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s // 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, l_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_M, s // 8), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, s, s // 8), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((s, expanded), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * s * s * (expanded + s // 8),
            bytes_accessed=k * s * (l_pad + s // 8),
            transcendentals=0),
        interpret=_interpret(),
    )(scalars, sym, pack, batch)


# --------------------------------------------------------------------- #
# Rowwise packed XOR + popcount kernel

# Rows per grid step of the rowwise kernel.  8K rows x ~16 lanes x 4 B x 2
# operands is ~1 MB of VMEM per program — large enough that per-program
# overhead stops dominating this microseconds-per-block kernel.
ROW_BLOCK = 8192


def _rowwise_body(a_ref, b_ref, out_ref, *, max_distance: int):
    """out[0, i] = popcount_nibbles(a_:,i ^ b_:,i) <= max_distance.

    ``a_ref``/``b_ref``: uint32 [lanes, ROW_BLOCK] — TRANSPOSED layout, 8
    packed 4-bit alphabet indices per element, one PAIR per lane column.
    With pairs on the lane axis every 128-lane stripe is fully used; the
    natural [P, lanes] layout left 13 of 128 lanes live (measured: 8x
    bandwidth loss).  A nibble-wise OR-collapse maps every non-zero XOR
    nibble to exactly one set bit, so population count == mismatch count;
    the per-pair sum over lanes is a cheap cross-sublane reduction.
    """
    x = jax.lax.bitwise_xor(a_ref[:], b_ref[:])
    y = x | jax.lax.shift_right_logical(x, jnp.uint32(2))
    y = y | jax.lax.shift_right_logical(y, jnp.uint32(1))
    y = y & jnp.uint32(0x11111111)
    mism = jnp.sum(jax.lax.population_count(y).astype(jnp.int32),
                   axis=0, keepdims=True)
    out_ref[:] = mism <= max_distance


@functools.partial(jax.jit, static_argnames=("max_distance",))
def rowwise_within_packed(a: jax.Array, b: jax.Array,
                          max_distance: int) -> jax.Array:
    """bool [P, 1]: paired-row packed Hamming <= max_distance.

    ``a``/``b``: uint32 [P, lanes] nibble-packed (see
    fastqdedup_tpu.ops.encode.pack_nibbles); P must be a multiple of
    ROW_BLOCK (callers pad with equal rows, which are trivially within).
    Operands are transposed once on device so pairs ride the lane axis
    (see _rowwise_body).
    """
    p, lanes = a.shape
    kernel = functools.partial(_rowwise_body, max_distance=max_distance)
    out = pl.pallas_call(
        kernel,
        grid=(p // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((lanes, ROW_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, ROW_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.bool_),
        interpret=_interpret(),
    )(a.T, b.T)
    return out.reshape(p, 1)

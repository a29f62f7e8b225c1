"""Native C FASTQ parser / gzip writer vs the pure-Python path.

The native layer (fastqdedup_tpu/native/_fastq_io.c) must be a drop-in for
the Python chunk reader (io/fastq.py) — same chunks, same errors — and the
native gzip writer must produce output byte-identical to
``gzip.GzipFile(mtime=0)`` so reruns stay deterministic.
"""

import gzip
import io

import numpy as np
import pytest

pytest.importorskip("fastqdedup_tpu.native.loader",
                    reason="native library could not be built")

from fastqdedup_tpu.io.fastq import (  # noqa: E402
    FastqChunk,
    FastqFormatError,
    _lines_to_chunk,
)
from fastqdedup_tpu.io.opener import xopen  # noqa: E402
from fastqdedup_tpu.native.loader import (  # noqa: E402
    NativeGzWriter,
    read_fastq_chunks_native,
)


def python_chunks(filename, chunk_records):
    """The pure-Python chunking logic, bypassing native acceleration."""
    with xopen(filename, "rb") as file:
        line_number = 0
        lines = []
        take = 4 * chunk_records
        for raw in file:
            line = raw.rstrip(b"\r\n")
            if not line and not lines:
                line_number += 1
                continue
            lines.append(line)
            if len(lines) == take:
                yield _lines_to_chunk(lines, filename, line_number)
                line_number += take
                lines = []
        if lines:
            while lines and not lines[-1]:
                lines.pop()
            if len(lines) % 4:
                raise FastqFormatError(f"{filename}: truncated FASTQ record",
                                       line=line_number)
            if lines:
                yield _lines_to_chunk(lines, filename, line_number)


def write_fastq(path, records, gz=False, trailing_newline=True,
                crlf=False):
    eol = "\r\n" if crlf else "\n"
    text = eol.join(
        f"@{name}{eol}{seq}{eol}+{eol}{qual}" for name, seq, qual in records)
    if trailing_newline:
        text += eol
    data = text.encode()
    if gz:
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
                f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


RECORDS = [
    (f"read{i} extra info", "ACGTN" * 6 + "AC"[: i % 2],
     "IIIII" * 6 + "#"[: i % 2])
    for i in range(937)
]


def assert_chunks_equal(a: FastqChunk, b: FastqChunk):
    assert a.count == b.count
    np.testing.assert_array_equal(a.sequences, b.sequences)
    np.testing.assert_array_equal(a.qualities, b.qualities)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.headers, b.headers)
    np.testing.assert_array_equal(a.header_offsets, b.header_offsets)


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunk_records", [64, 937, 10_000])
def test_native_matches_python(tmp_path, gz, chunk_records):
    path = str(tmp_path / ("t.fastq" + (".gz" if gz else "")))
    write_fastq(path, RECORDS, gz=gz)
    native = list(read_fastq_chunks_native(path, chunk_records))
    python = list(python_chunks(path, chunk_records))
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert_chunks_equal(a, b)


def test_native_crlf_and_no_trailing_newline(tmp_path):
    path = str(tmp_path / "t.fastq")
    write_fastq(path, RECORDS[:5], crlf=True, trailing_newline=False)
    native = list(read_fastq_chunks_native(path, 100))
    python = list(python_chunks(path, 100))
    for a, b in zip(native, python):
        assert_chunks_equal(a, b)


def test_native_buffer_overflow_carry(tmp_path):
    # Records far larger than the initial per-record estimate force the
    # stash/carry path in fq_next_chunk.
    big = [(f"r{i}", "A" * 5000, "I" * 5000) for i in range(40)]
    path = str(tmp_path / "big.fastq")
    write_fastq(path, big)
    native = list(read_fastq_chunks_native(path, 16))
    total = sum(c.count for c in native)
    assert total == 40
    joined_py = list(python_chunks(path, 10 ** 9))[0]
    joined_seq = np.concatenate([c.sequences for c in native])
    np.testing.assert_array_equal(joined_seq, joined_py.sequences)


@pytest.mark.parametrize("content,match", [
    (b"ACGT\nACGT\n+\nIIII\n", "expected '@'"),
    (b"@r\nACGT\nIIII\nIIII\n", r"expected '\+'"),
    (b"@r\nACGT\n+\nIII\n", "differ in length"),
    (b"@r\nACGT\n+\n", "truncated"),
])
def test_native_format_errors(tmp_path, content, match):
    path = str(tmp_path / "bad.fastq")
    path_obj = tmp_path / "bad.fastq"
    path_obj.write_bytes(content)
    with pytest.raises(FastqFormatError, match=match):
        list(read_fastq_chunks_native(path, 100))


def test_native_empty_file(tmp_path):
    path = tmp_path / "empty.fastq"
    path.write_bytes(b"")
    assert list(read_fastq_chunks_native(str(path), 100)) == []


@pytest.mark.parametrize("level", [1, 6, 9])
def test_native_writer_byte_identical(tmp_path, level):
    payload = b"@r\nACGTACGT\n+\nIIIIIIII\n" * 3000
    ref = io.BytesIO()
    g = gzip.GzipFile(filename="", mode="wb", fileobj=ref,
                      compresslevel=level, mtime=0)
    for i in range(0, len(payload), 999):
        g.write(payload[i:i + 999])
    g.close()
    path = tmp_path / "out.gz"
    w = NativeGzWriter(str(path), level)
    for i in range(0, len(payload), 999):
        w.write(payload[i:i + 999])
    w.close()
    assert path.read_bytes() == ref.getvalue()
    assert gzip.decompress(path.read_bytes()) == payload


def test_native_average_error_rates_matches_python():
    from fastqdedup_tpu.native.loader import average_error_rates_native
    from fastqdedup_tpu.quality import average_error_rate
    rng = np.random.default_rng(3)
    quals = [bytes((33 + rng.integers(0, 60, size=rng.integers(1, 50)))
                   .astype(np.uint8)) for _ in range(300)]
    data = np.frombuffer(b"".join(quals), dtype=np.uint8)
    offsets = np.zeros(len(quals) + 1, dtype=np.int64)
    np.cumsum([len(q) for q in quals], out=offsets[1:])
    got = average_error_rates_native(data, offsets)
    want = np.array([average_error_rate(q.decode("ascii")) for q in quals])
    np.testing.assert_array_equal(got, want)  # bit-identical, not approx


def test_native_average_error_rates_range_error():
    from fastqdedup_tpu.native.loader import average_error_rates_native
    data = np.frombuffer(b"II\x1fI", dtype=np.uint8)  # 0x1f < 33
    offsets = np.array([0, 4], dtype=np.int64)
    with pytest.raises(ValueError, match="phred range"):
        average_error_rates_native(data, offsets)
    data127 = np.frombuffer(b"I\x7f", dtype=np.uint8)  # 127 > 126
    offsets2 = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="phred range"):
        average_error_rates_native(data127, offsets2)


def test_native_average_error_rates_empty_record_nan():
    from fastqdedup_tpu.native.loader import average_error_rates_native
    data = np.frombuffer(b"II", dtype=np.uint8)
    offsets = np.array([0, 0, 2], dtype=np.int64)
    got = average_error_rates_native(data, offsets)
    assert np.isnan(got[0]) and not np.isnan(got[1])


def test_ragged_average_error_rate_dispatch():
    from fastqdedup_tpu.quality import (
        batch_average_error_rate, ragged_average_error_rate)
    rng = np.random.default_rng(4)
    quals = [bytes((33 + rng.integers(0, 60, size=20)).astype(np.uint8))
             for _ in range(50)]
    data = np.frombuffer(b"".join(quals), dtype=np.uint8)
    offsets = np.arange(51, dtype=np.int64) * 20
    got = ragged_average_error_rate(data, offsets)
    want = batch_average_error_rate(data.reshape(50, 20).copy(),
                                    np.full(50, 20))
    np.testing.assert_array_equal(got, want)


def test_key_accumulator_growth_stress():
    """Force repeated hash-table growth (regression: acc_add once updated
    a stale entry pointer after the grow realloc, corrupting the heap at
    tens of millions of unique keys)."""
    import numpy as np

    from fastqdedup_tpu.native.loader import KeyAccumulator

    rng = np.random.default_rng(0)
    acc = KeyAccumulator(expected=16)  # tiny: many growth steps
    n_chunks, per_chunk, length = 8, 50_000, 12
    seen = {}
    base = 0
    for c in range(n_chunks):
        keys = rng.integers(65, 69, size=(per_chunk, length),
                            dtype=np.uint8)
        # Re-insert some earlier keys so counts exceed 1.
        if c:
            keys[: per_chunk // 4] = prev[: per_chunk // 4]
        prev = keys
        counted = (rng.random(per_chunk) < 0.8).astype(np.uint8)
        data = keys.reshape(-1)
        offsets = np.arange(per_chunk + 1, dtype=np.int64) * length
        acc.add(data, offsets, counted, base)
        for i in range(per_chunk):
            k = keys[i].tobytes()
            cnt, pos = seen.get(k, (0, 1 << 62))
            seen[k] = (cnt + int(counted[i]), min(pos, base + i))
        base += per_chunk
    kd, ko, counts, first_pos = acc.export()
    assert len(counts) == len(seen)
    raw = kd.tobytes()
    for i in range(len(counts)):
        k = raw[ko[i]:ko[i + 1]]
        cnt, pos = seen[k]
        assert counts[i] == cnt, k
        assert first_pos[i] == pos, k
    acc.close()


def test_key_accumulator_byte_presence():
    """The insertion-time presence bitmap must flag exactly the byte
    values occurring in stored keys (pass 2 derives the alphabet from it
    instead of rescanning the merged key table)."""
    import numpy as np

    from fastqdedup_tpu.native.loader import KeyAccumulator

    acc = KeyAccumulator(expected=4)
    keys = [b"ACGT", b"ACGA", b"NNN", b"\x00\xffZ"]
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    offsets = np.cumsum([0] + [len(k) for k in keys]).astype(np.int64)
    acc.add(data, offsets, None, 0)
    # Duplicate insert must not change presence.
    acc.add(data, offsets, None, len(keys))
    presence = acc.byte_presence()
    expected = np.zeros(256, dtype=bool)
    expected[list(set(b"".join(keys)))] = True
    np.testing.assert_array_equal(presence, expected)
    acc.close()


def test_bgzf_parallel_parse_matches_plain_gzip(tmp_path):
    """A BGZF-blocked file must parse to the identical record stream as
    the same data in plain gzip (the parallel-inflate path) — including
    multi-block files, a trailing partial block, and gzip-reader
    compatibility of the BGZF output itself."""
    import gzip
    import random

    import numpy as np

    from fastqdedup_tpu.io.bgzf import BgzfWriter
    from fastqdedup_tpu.native.loader import read_fastq_chunks_native

    rng = random.Random(5)
    records = []
    for i in range(20_000):
        seq = "".join(rng.choice("ACGT") for _ in range(40))
        records.append(f"@r{i} x\n{seq}\n+\n{'I' * 40}\n")
    payload = "".join(records).encode()

    plain = tmp_path / "plain.fastq.gz"
    with gzip.open(plain, "wb") as f:
        f.write(payload)
    blocked = tmp_path / "blocked.fastq.gz"
    with BgzfWriter(str(blocked)) as f:
        # Uneven write sizes exercise block buffering.
        for start in range(0, len(payload), 37_111):
            f.write(payload[start:start + 37_111])

    # BGZF output is itself valid gzip.
    assert gzip.open(blocked, "rb").read() == payload

    def collect(path):
        seqs, heads = [], []
        for c in read_fastq_chunks_native(str(path), 512):
            seqs.append(c.sequences.tobytes())
            heads.append(c.headers.tobytes())
        return b"".join(seqs), b"".join(heads)

    assert collect(plain) == collect(blocked)


def test_bgzf_corrupt_block_raises(tmp_path):
    from fastqdedup_tpu.io.bgzf import BgzfWriter
    from fastqdedup_tpu.native.loader import read_fastq_chunks_native

    path = tmp_path / "bad.fastq.gz"
    with BgzfWriter(str(path)) as f:
        f.write(b"@r0 x\nACGT\n+\nIIII\n" * 10_000)
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0xFF  # flip a payload byte mid-file
    open(path, "wb").write(bytes(data))
    import pytest
    with pytest.raises(Exception):
        for _ in read_fastq_chunks_native(str(path), 512):
            pass


def test_native_hash_rows_matches_numpy_fallback():
    """fq_hash_rows must be bit-identical to the numpy _hash_window_rows
    path (the bucket grouping partitions work across hosts by these
    values, so native/numpy hosts must agree)."""
    from fastqdedup_tpu.native.loader import hash_rows_native
    from fastqdedup_tpu.ops import bucket as b

    def numpy_path(window, salt, strong):
        n, w = window.shape
        w8 = -(-w // 8) * 8
        if w8 != w:
            padded = np.zeros((n, w8), dtype=np.uint8)
            padded[:, :w] = window
        else:
            padded = np.ascontiguousarray(window)
        cols = np.asfortranarray(padded.view(np.uint64).reshape(n, w8 // 8))
        seed = (0x9E3779B97F4A7C15 * (salt + 0x10001) + 0x85EBCA6B) \
            & b._MASK64
        h = np.full(n, seed, dtype=np.uint64)
        tmp = np.empty(n, dtype=np.uint64)
        c33, c29 = np.uint64(33), np.uint64(29)
        m1 = np.uint64(0xFF51AFD7ED558CCD)
        m2 = np.uint64(0xC4CEB9FE1A85EC53)
        m3 = np.uint64(0x2545F4914F6CDD1D)

        def mix(x):
            np.right_shift(x, c33, out=tmp)
            np.bitwise_xor(x, tmp, out=x)
            np.multiply(x, m1, out=x)
            np.right_shift(x, c33, out=tmp)
            np.bitwise_xor(x, tmp, out=x)
            np.multiply(x, m2, out=x)
            np.right_shift(x, c33, out=tmp)
            np.bitwise_xor(x, tmp, out=x)

        with np.errstate(over="ignore"):
            for c in range(cols.shape[1]):
                np.bitwise_xor(h, cols[:, c], out=h)
                if strong:
                    mix(h)
                    np.multiply(h, m3, out=h)
                else:
                    np.multiply(h, m3, out=h)
                    np.right_shift(h, c29, out=tmp)
                    np.bitwise_xor(h, tmp, out=h)
            mix(h)
        return h

    rng = np.random.default_rng(42)
    for n, w in [(1000, 50), (7, 1), (1, 8), (257, 100), (3, 17),
                 (5, 64), (2, 7)]:
        mat = rng.integers(0, 256, size=(n, w), dtype=np.uint8)
        for salt in [0, 50 * 65536 + 25, 100 + 65537]:
            for strong in [True, False]:
                want = numpy_path(mat, salt, strong)
                got = b._hash_window_rows(mat, salt, strong=strong)
                assert (want == got).all(), (n, w, salt, strong)
                seed = (0x9E3779B97F4A7C15 * (salt + 0x10001)
                        + 0x85EBCA6B) & b._MASK64
                direct = hash_rows_native(mat, seed, strong=strong)
                assert (want == direct).all(), (n, w, salt, strong)
        # Strided row views (window of a wider matrix) must also match.
        big = rng.integers(0, 256, size=(n, w + 24), dtype=np.uint8)
        view = big[:, 11:11 + w]
        assert (numpy_path(view, 9, True)
                == b._hash_window_rows(view, 9)).all()


def test_native_hash_rows_rejects_bad_layouts():
    from fastqdedup_tpu.native.loader import hash_rows_native
    mat = np.zeros((8, 16), dtype=np.uint8)
    with pytest.raises(ValueError):
        hash_rows_native(mat[:, ::2], 1)       # columns not contiguous
    with pytest.raises(ValueError):
        hash_rows_native(mat[::-1], 1)         # negative row stride
    with pytest.raises(ValueError):
        hash_rows_native(mat.astype(np.int16), 1)  # wrong dtype


def test_bgzf_giant_record_exceeds_slot_headroom(tmp_path):
    """A single record larger than the async reader's slot headroom
    (1 MiB) forces the giant-line overflow path: the unread tail cannot
    move into the next slot's headroom, so it accumulates in an owned
    buffer across several slot swaps — and the record must still parse
    byte-exactly (plus the caller's buffer-growth retry for records
    larger than the chunk payload estimate)."""
    import random

    from fastqdedup_tpu.io.bgzf import BgzfWriter
    from fastqdedup_tpu.native.loader import read_fastq_chunks_native

    rng = random.Random(11)
    giant = "".join(rng.choice("ACGT") for _ in range(3 << 20))  # 3 MiB
    payload = (f"@small x\nACGT\n+\nIIII\n"
               f"@giant y\n{giant}\n+\n{'I' * len(giant)}\n"
               f"@after z\nTTTT\n+\nIIII\n").encode()
    path = tmp_path / "giant.fastq.gz"
    with BgzfWriter(str(path)) as f:
        f.write(payload)

    chunks = list(read_fastq_chunks_native(str(path), 4))
    seqs = []
    for c in chunks:
        for i in range(c.count):
            seqs.append(c.sequences[c.offsets[i]:c.offsets[i + 1]]
                        .tobytes())
    assert seqs == [b"ACGT", giant.encode(), b"TTTT"]


def test_bgzf_blocks_followed_by_plain_gzip_member(tmp_path):
    """BGZF members followed by a plain (non-BGZF) gzip member must
    stream seamlessly: the async producer switches from block-parallel
    inflate to the sequential tail path mid-file."""
    import gzip

    from fastqdedup_tpu.io.bgzf import BgzfWriter
    from fastqdedup_tpu.native.loader import read_fastq_chunks_native

    head = b"".join(b"@a%d x\nACGTACGT\n+\nIIIIIIII\n" % i
                    for i in range(5_000))
    tail = b"".join(b"@b%d y\nTTTTGGGG\n+\nIIIIIIII\n" % i
                    for i in range(5_000))
    path = tmp_path / "mixed.fastq.gz"
    with open(path, "wb") as raw:
        w = BgzfWriter(raw)
        w.write(head)
        w.close()  # writes the BGZF EOF marker (an empty member)
        raw.write(gzip.compress(tail, 1))

    got = b"".join(c.headers.tobytes()
                   for c in read_fastq_chunks_native(str(path), 512))
    want = b"".join(line[1:] for line in (head + tail).split(b"\n")[::4]
                    if line)
    assert got == want


def test_bgzf_truncated_mid_block_raises(tmp_path):
    from fastqdedup_tpu.io.bgzf import BgzfWriter
    from fastqdedup_tpu.native.loader import read_fastq_chunks_native

    path = tmp_path / "trunc.fastq.gz"
    with BgzfWriter(str(path)) as f:
        f.write(b"@r0 x\nACGT\n+\nIIII\n" * 50_000)
    data = open(path, "rb").read()
    open(path, "wb").write(data[:len(data) // 2 + 7])
    import pytest
    with pytest.raises(Exception, match="truncated|corrupt"):
        for _ in read_fastq_chunks_native(str(path), 512):
            pass


def test_sort_permute4_matches_argsort():
    from fastqdedup_tpu.native.loader import sort_permute4_native
    rng = np.random.default_rng(21)
    for n in (0, 1, 5, 4096):
        c0 = rng.permutation(max(n, 1))[:n].astype(np.int64) * 7
        cols = np.stack([c0] + [
            rng.integers(-2**50, 2**50, n).astype(np.int64)
            for _ in range(3)])
        got = sort_permute4_native(cols)
        order = np.argsort(cols[0], kind="stable")
        for g, c in zip(got, cols):
            assert (g == c[order]).all()


def test_owned_merge_native_matches_numpy_fallback():
    """The C hash-aggregation owned merge must produce exactly the keys,
    counts, min first positions, and tournament representatives of the
    numpy path (canonicalized by representative order — emission order
    legitimately differs)."""
    import fastqdedup_tpu.native.loader as loader_mod
    from fastqdedup_tpu.native.loader import owned_merge_native
    from fastqdedup_tpu.parallel.distributed import _owned_meta_merge

    rng = np.random.default_rng(22)
    n, n_keys, nproc = 30_000, 9_000, 3
    key_ids = rng.integers(0, n_keys, n)
    h1 = rng.integers(0, 2**63, n_keys, dtype=np.int64)[key_ids]
    h2 = rng.integers(0, 2**63, n_keys, dtype=np.int64)[key_ids]
    g_len = rng.integers(20, 30, n).astype(np.int64)[key_ids % n] * 0 + \
        (key_ids % 7 + 20)
    g_cnt = rng.integers(0, 3, n).astype(np.int64)
    g_fp = rng.integers(0, 10**9, n).astype(np.int64)
    host_starts = np.array([0, n // 3, 2 * n // 3, n], dtype=np.int64)
    for pid in range(nproc):
        native = owned_merge_native(
            g_len, h1.view(np.uint64), h2.view(np.uint64),
            g_cnt, g_fp, pid, nproc, host_starts)
        saved = loader_mod.owned_merge_native
        del loader_mod.owned_merge_native
        try:
            ref = _owned_meta_merge(
                g_len, h1.view(np.uint64), h2.view(np.uint64),
                g_cnt, g_fp, pid, nproc, host_starts=host_starts)
        finally:
            loader_mod.owned_merge_native = saved
        no, ro = np.argsort(native[0]), np.argsort(ref[0])
        for a, b in zip(native, ref):
            assert (a[no] == b[ro]).all()


def test_edit_verify_native_matches_reference_semantics():
    from fastqdedup_tpu.distance import within_distance
    from fastqdedup_tpu.native.loader import edit_verify_native

    rng = np.random.default_rng(23)
    n, lp = 120, 32
    padded = np.full((n, lp), 0xFF, dtype=np.uint8)
    keys = []
    alph = np.frombuffer(b"ACGTN", dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    for i in range(n):
        k = alph[rng.integers(0, 5, rng.integers(1, 30))]
        keys.append(k.tobytes())
        lens[i] = len(k)
        padded[i, :len(k)] = k
    ci = rng.integers(0, n, 2000).astype(np.int64)
    cj = rng.integers(0, n, 2000).astype(np.int64)
    for d in (0, 1, 2):
        got = edit_verify_native(padded, lens, ci, cj, d)
        want = np.array([
            within_distance(keys[a].decode(), keys[b].decode(), d,
                            use_edit_distance=True)
            for a, b in zip(ci, cj)])
        assert (got == want).all()
    with pytest.raises(ValueError):
        edit_verify_native(padded, lens, ci, cj, 17)


def test_bgzf_boundary_and_range_units(tmp_path):
    """Byte-range primitives: boundary scan finds exact member starts,
    per-range newline counts tile the file, non-BGZF returns None."""
    from fastqdedup_tpu.io.bgzf import BGZF_EOF, compress_block
    from fastqdedup_tpu.native.loader import (
        bgzf_boundary,
        count_bgzf_range_units,
    )

    data = b"".join(b"@r%d\nACGT\n+\n!!!!\n" % i for i in range(5000))
    path = tmp_path / "t.fastq.gz"
    blocks = []
    with open(path, "wb") as f:
        off = 0
        for i in range(0, len(data), 3000):
            blocks.append(off)
            member = compress_block(data[i:i + 3000], 1)
            f.write(member)
            off += len(member)
        f.write(BGZF_EOF)
    # Boundary scan from any offset lands on the next true member start.
    assert bgzf_boundary(str(path), 0) == 0
    for probe in (1, blocks[1] - 1, blocks[1], blocks[1] + 1):
        expect = min(b for b in blocks + [off] if b >= probe)
        assert bgzf_boundary(str(path), probe) == expect
    # Range newline counts tile to the total.
    size = off + len(BGZF_EOF)
    total = 0
    for p in range(3):
        lo = size * p // 3
        hi = size * (p + 1) // 3 if p < 2 else -1
        ends, lines = count_bgzf_range_units(str(path), lo, hi)
        total += lines.sum()
    assert total == data.count(b"\n")
    # Plain gzip input: not splittable.
    import gzip as _gzip
    plain = tmp_path / "plain.fastq.gz"
    with _gzip.open(plain, "wb") as f:
        f.write(data)
    assert count_bgzf_range_units(str(plain), 0, -1) is None
    assert bgzf_boundary(str(plain), 0) is None


def test_rank_rows_native_matches_stable_void_argsort():
    import numpy as np

    from fastqdedup_tpu.native.loader import rank_rows_native

    rng = np.random.default_rng(4)
    for m, w in ((1, 5), (37, 3), (4096, 17), (100000, 64)):
        mat = rng.integers(0, 256, size=(m, w), dtype=np.uint8)
        if m > 10:
            mat[m // 2:m // 2 + 4] = mat[0]      # exact duplicates
            mat[1:m:5, :w // 2] = mat[0, :w // 2]  # shared prefixes
        void = np.ascontiguousarray(mat).view(
            np.dtype((np.void, w))).ravel()
        want = np.empty(m, dtype=np.int64)
        want[np.argsort(void, kind="stable")] = np.arange(m)
        assert np.array_equal(rank_rows_native(mat), want), (m, w)


def test_pack_nibbles_native_matches_numpy():
    import numpy as np

    from fastqdedup_tpu.native.loader import pack_nibbles_native
    from fastqdedup_tpu.ops.encode import pack_nibbles

    rng = np.random.default_rng(6)
    for m, w in ((1, 1), (33, 7), (5000, 100)):
        lanes = max(-(-w // 8), 1)
        mat = rng.integers(0, 5, size=(m, w), dtype=np.uint8)
        assert np.array_equal(pack_nibbles_native(mat, lanes),
                              pack_nibbles(mat, lanes))
    # raw bytes through a LUT in the same pass
    lut = np.full(256, 255, np.uint8)
    for i, c in enumerate(b"ACGTN"):
        lut[c] = i
    idx = rng.integers(0, 5, size=(2000, 57), dtype=np.uint8)
    raw = np.frombuffer(b"ACGTN", dtype=np.uint8)[idx]
    assert np.array_equal(pack_nibbles_native(raw, 8, lut=lut),
                          pack_nibbles(idx, 8))
    # out-of-range index raises
    import pytest
    bad = np.full((10, 4), 16, dtype=np.uint8)
    with pytest.raises(ValueError):
        pack_nibbles_native(bad, 1)


def test_hash_owner_select_native_matches_numpy():
    import numpy as np

    from fastqdedup_tpu.native.loader import hash_owner_select_native
    from fastqdedup_tpu.ops.bucket import _MASK64, _hash_window_rows
    from fastqdedup_tpu.parallel.distributed import bucket_owner_mask

    rng = np.random.default_rng(7)
    win = rng.integers(0, 256, size=(70000, 50), dtype=np.uint8)
    w = 50
    seed = (0x9E3779B97F4A7C15 * (w + 0x10001) + 0x85EBCA6B) & _MASK64
    ref_h = _hash_window_rows(win, w, strong=False)
    for seg in (0, 1):
        salt_mix = (0x9E3779B97F4A7C15 * (seg + 1)) & _MASK64
        for nproc in (2, 3, 4):
            got_union = 0
            for pid in range(nproc):
                want = np.flatnonzero(
                    bucket_owner_mask(ref_h, seg, pid, nproc))
                idx, h = hash_owner_select_native(
                    win, seed, salt_mix, pid, nproc)
                assert np.array_equal(idx, want), (seg, nproc, pid)
                assert np.array_equal(h, ref_h[want])
                got_union += len(idx)
            assert got_union == len(win)  # every row owned exactly once

"""Parallel range ingest: concurrent BGZF range readers in one process.

The serial native parser's record scan bounds pass-1 throughput once
inflate overlaps; _plan_local_ranges splits the input into record ranges
read concurrently.  Chunks then arrive out of position order, so these
tests pin the order-tolerant semantics end to end: the accumulator's
first_pos minima (is_new marking on supersession), the record arena's
position-keyed gather, the chunk-cache sort, and byte parity against the
serial reader for every pass-3 layout.
"""

import gzip
import random

import numpy as np
import pytest

from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS
from fastqdedup_tpu.pipeline import (
    _parallel_range_chunks,
    _plan_local_ranges,
    deduplicate_cluster,
)

pytest.importorskip("fastqdedup_tpu.native.loader")


def _write_bgzf_fastq(path, records, block_bytes=1 << 12):
    """FASTQ in small BGZF blocks so even small inputs span many
    members (range planning needs member boundaries to split at)."""
    from fastqdedup_tpu.io.bgzf import BgzfWriter

    writer = BgzfWriter(str(path), block_bytes=block_bytes) \
        if _bgzf_takes_block_bytes() else BgzfWriter(str(path))
    try:
        for name, seq, qual in records:
            writer.write(f"@{name}\n{seq}\n+\n{qual}\n".encode())
    finally:
        writer.close()


def _bgzf_takes_block_bytes():
    import inspect

    from fastqdedup_tpu.io.bgzf import BgzfWriter
    return "block_bytes" in inspect.signature(BgzfWriter).parameters


def _reads_with_cross_range_dups(n, length=40, seed=7):
    """Duplicate keys deliberately placed in DIFFERENT quarters of the
    file, so parallel readers race to insert them and the out-of-order
    first-occurrence path actually fires."""
    rng = random.Random(seed)
    mols = ["".join(rng.choice("ACGT") for _ in range(length))
            for _ in range(max(8, n // 8))]
    reads = []
    for i in range(n):
        seq = rng.choice(mols)
        if rng.random() < 0.3:  # near-duplicate within d=1
            pos = rng.randrange(length)
            seq = seq[:pos] + rng.choice("ACGT") + seq[pos + 1:]
        qual = "".join(chr(33 + rng.randrange(28, 40))
                       for _ in range(length))
        reads.append((f"r{i}", seq, qual))
    return reads


def _read_gz(path):
    with gzip.open(path, "rb") as f:
        return f.read()


def test_plan_local_ranges_tiles_the_input(tmp_path):
    reads = _reads_with_cross_range_dups(400)
    path = tmp_path / "in.fastq.gz"
    _write_bgzf_fastq(path, reads)
    parts = _plan_local_ranges([str(path)], 4)
    assert parts is not None
    # Bases tile [0, 400) and record budgets sum to the record count.
    bases = [base for _, base in parts]
    budgets = [plan[0][2] for plan, _ in parts]
    assert bases[0] == 0
    assert sorted(bases) == bases
    for (plan, base), nxt in zip(parts, bases[1:] + [400]):
        assert base + plan[0][2] == nxt
    assert sum(budgets) == 400


def test_plan_local_ranges_rejects_plain_gzip(tmp_path):
    path = tmp_path / "in.fastq.gz"
    with gzip.open(path, "wb") as f:
        for name, seq, qual in _reads_with_cross_range_dups(50):
            f.write(f"@{name}\n{seq}\n+\n{qual}\n".encode())
    assert _plan_local_ranges([str(path)], 2) is None


def test_parallel_range_chunks_yield_every_record_once(tmp_path):
    reads = _reads_with_cross_range_dups(300)
    path = tmp_path / "in.fastq.gz"
    _write_bgzf_fastq(path, reads)
    parts = _plan_local_ranges([str(path)], 3)
    assert parts is not None and len(parts) == 3
    seen = {}
    for base, chunks in _parallel_range_chunks([str(path)], 29, parts):
        (chunk,) = chunks
        for i in range(chunk.count):
            lo, hi = chunk.offsets[i], chunk.offsets[i + 1]
            seen[base + i] = bytes(chunk.sequences[lo:hi])
    assert sorted(seen) == list(range(300))
    for i, (_, seq, _) in enumerate(reads):
        assert seen[i] == seq.encode()


def test_accumulator_marks_out_of_order_first_occurrence():
    """A later batch with a LOWER base must both lower first_pos and set
    is_new for the superseding record (the arena capture contract)."""
    from fastqdedup_tpu.native.loader import KeyAccumulator

    def ragged(keys):
        data = np.frombuffer(b"".join(keys), dtype=np.uint8)
        offs = np.zeros(len(keys) + 1, dtype=np.int64)
        np.cumsum([len(k) for k in keys], out=offs[1:])
        return data, offs

    acc = KeyAccumulator(16)
    # Range reader B arrives first with records 100..101.
    d, o = ragged([b"AAAA", b"CCCC"])
    marks = acc.add_mark(d, o, None, 100)
    assert marks.tolist() == [1, 1]
    # Range reader A then delivers records 0..2; AAAA at position 1
    # supersedes position 100 and must be marked again.
    d, o = ragged([b"GGGG", b"AAAA", b"CCCC"])
    marks = acc.add_mark(d, o, None, 0)
    assert marks.tolist() == [1, 1, 1]
    # A later batch at higher positions never re-marks.
    d, o = ragged([b"AAAA"])
    assert acc.add_mark(d, o, None, 500).tolist() == [0]
    _, _, counts, first_pos = acc.export()
    assert sorted(first_pos.tolist()) == [0, 1, 2]
    assert counts.sum() == 6
    acc.close()


@pytest.mark.parametrize("layout", ["arena", "cache", "restream"])
@pytest.mark.parametrize("readers", [2, 3])
def test_parallel_ingest_byte_parity(tmp_path, monkeypatch, layout,
                                     readers):
    reads = _reads_with_cross_range_dups(600)
    src = tmp_path / "in.fastq.gz"
    _write_bgzf_fastq(src, reads)

    if layout == "arena":
        monkeypatch.setenv("FASTQDEDUP_RECORD_ARENA", "1")
    elif layout == "cache":
        monkeypatch.setenv("FASTQDEDUP_RECORD_ARENA", "0")
    else:
        monkeypatch.setenv("FASTQDEDUP_RECORD_ARENA", "0")
        monkeypatch.setenv("FASTQDEDUP_MEMORY_LIMIT", "1")

    outs = {}
    for mode, flag in (("serial", "0"), ("parallel", "1")):
        monkeypatch.setenv("FASTQDEDUP_PARALLEL_INGEST", flag)
        monkeypatch.setenv("FASTQDEDUP_INGEST_READERS", str(readers))
        out = tmp_path / f"out-{mode}.fastq.gz"
        deduplicate_cluster(
            [str(src)], [str(out)], None, 1, 0.001,
            CLUSTER_DISSECTION_METHODS["directional"], False,
            chunk_records=53)
        outs[mode] = _read_gz(out)
    assert outs["parallel"] == outs["serial"]
    assert outs["serial"]  # the run produced records


def test_parallel_ingest_paired_end_parity(tmp_path, monkeypatch):
    reads = _reads_with_cross_range_dups(500)
    r1 = tmp_path / "r1.fastq.gz"
    r2 = tmp_path / "r2.fastq.gz"
    _write_bgzf_fastq(r1, [(f"{n} 1:x", s, q) for n, s, q in reads])
    _write_bgzf_fastq(r2, [(f"{n} 2:x", s[::-1], q) for n, s, q in reads])

    outs = {}
    for mode, flag in (("serial", "0"), ("parallel", "1")):
        monkeypatch.setenv("FASTQDEDUP_PARALLEL_INGEST", flag)
        monkeypatch.setenv("FASTQDEDUP_INGEST_READERS", "3")
        out = [str(tmp_path / f"{mode}-1.fastq.gz"),
               str(tmp_path / f"{mode}-2.fastq.gz")]
        deduplicate_cluster(
            [str(r1), str(r2)], out, [slice(0, 20), slice(0, 20)], 1,
            0.001, CLUSTER_DISSECTION_METHODS["directional"], False,
            chunk_records=41)
        outs[mode] = tuple(_read_gz(p) for p in out)
    assert outs["parallel"] == outs["serial"]


def test_parallel_reader_error_surfaces_and_threads_exit(tmp_path):
    """A corrupt BGZF block inside one reader's range must raise on the
    consumer and leave no lingering reader threads."""
    import threading
    import time

    reads = _reads_with_cross_range_dups(400)
    path = tmp_path / "in.fastq.gz"
    _write_bgzf_fastq(path, reads)
    parts = _plan_local_ranges([str(path)], 3)
    assert parts is not None
    # Corrupt a compressed block in the middle third (after the range
    # plan was computed from the intact file).
    data = bytearray(path.read_bytes())
    mid = len(data) // 2
    for off in range(mid, mid + 64):
        data[off] ^= 0xFF
    path.write_bytes(bytes(data))

    before = threading.active_count()
    with pytest.raises(Exception) as excinfo:
        for _ in _parallel_range_chunks([str(path)], 29, parts):
            pass
    assert not isinstance(excinfo.value, (KeyboardInterrupt, SystemExit))
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_parallel_chunks_consumer_abandons_early(tmp_path):
    """Closing the consumer generator mid-stream must stop the reader
    threads (no deadlock on the bounded queue)."""
    import threading
    import time

    reads = _reads_with_cross_range_dups(600)
    path = tmp_path / "in.fastq.gz"
    _write_bgzf_fastq(path, reads)
    parts = _plan_local_ranges([str(path)], 3)
    assert parts is not None
    before = threading.active_count()
    gen = _parallel_range_chunks([str(path)], 17, parts)
    next(gen)
    gen.close()  # triggers the finally: stop + join
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before

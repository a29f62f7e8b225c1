"""FASTQ I/O layer tests."""

import gzip

import numpy as np
import pytest

from fastqdedup_tpu.io import (
    FastqFormatError,
    FastqRecord,
    FastqWriter,
    fastq_files_to_records,
    file_to_fastq_reader,
    records_are_mates,
)
from fastqdedup_tpu.io.fastq import read_fastq_chunks

FASTQ = (b"@read1 extra info\nACGT\n+\nIIII\n"
         b"@read2\nGGGGA\n+\nIIIIB\n"
         b"@read3\n\n+\n\n")


def _write(tmp_path, name, data):
    path = tmp_path / name
    if name.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        path.write_bytes(data)
    return str(path)


@pytest.mark.parametrize("name", ["in.fastq", "in.fastq.gz"])
def test_reader_roundtrip(tmp_path, name):
    path = _write(tmp_path, name, FASTQ)
    records = list(file_to_fastq_reader(path))
    assert [r.name for r in records] == ["read1 extra info", "read2",
                                         "read3"]
    assert records[0].sequence == "ACGT"
    assert records[0].qualities == "IIII"
    assert records[1].sequence == "GGGGA"
    assert records[2].sequence == ""
    assert records[0].fastq_bytes() == \
        b"@read1 extra info\nACGT\n+\nIIII\n"


def test_reader_rejects_bad_header(tmp_path):
    path = _write(tmp_path, "bad.fastq", b"read1\nACGT\n+\nIIII\n")
    with pytest.raises(FastqFormatError):
        list(file_to_fastq_reader(path))


def test_reader_rejects_length_mismatch(tmp_path):
    path = _write(tmp_path, "bad.fastq", b"@r\nACGT\n+\nIII\n")
    with pytest.raises(FastqFormatError):
        list(file_to_fastq_reader(path))


def test_chunks_match_records(tmp_path):
    data = b"".join(
        f"@r{i} c\n{'ACGT' * (1 + i % 3)}\n+\n{'I' * 4 * (1 + i % 3)}\n"
        .encode() for i in range(100))
    path = _write(tmp_path, "many.fastq.gz", data)
    records = list(file_to_fastq_reader(path))
    chunks = list(read_fastq_chunks(path, chunk_records=16))
    assert sum(c.count for c in chunks) == len(records)
    assert len(chunks) == 7
    i = 0
    for chunk in chunks:
        for k in range(chunk.count):
            assert chunk.sequence(k).decode() == records[i].sequence
            assert chunk.quality(k).decode() == records[i].qualities
            assert chunk.header(k).decode() == records[i].name
            i += 1


def test_records_are_mates():
    r = lambda name: FastqRecord(name, "A", "I")  # noqa: E731
    assert records_are_mates(r("x y"), r("x z"))
    assert records_are_mates(r("a/1"), r("a/2"))
    assert records_are_mates(r("a1"), r("a2"), r("a3"))
    assert not records_are_mates(r("a"), r("b"))
    assert not records_are_mates(r("aa"), r("ab"))


def test_mate_sync_error(tmp_path):
    p1 = _write(tmp_path, "r1.fastq", b"@a/1\nAC\n+\nII\n@b/1\nAC\n+\nII\n")
    p2 = _write(tmp_path, "r2.fastq", b"@a/2\nGT\n+\nII\n@c/2\nGT\n+\nII\n")
    with pytest.raises(FastqFormatError, match="not in sync"):
        list(fastq_files_to_records([p1, p2]))


def test_writer_deterministic_gzip(tmp_path):
    out1 = str(tmp_path / "o1.fastq.gz")
    out2 = str(tmp_path / "o2.fastq.gz")
    for out in (out1, out2):
        with FastqWriter(out) as w:
            w.write_record(FastqRecord("r", "ACGT", "IIII"))
    assert (tmp_path / "o1.fastq.gz").read_bytes() == \
        (tmp_path / "o2.fastq.gz").read_bytes()
    with gzip.open(out1, "rb") as f:
        assert f.read() == b"@r\nACGT\n+\nIIII\n"


def test_chunk_lengths_and_ids(tmp_path):
    path = _write(tmp_path, "x.fastq",
                  b"@n1 d\nAC\n+\nII\n@n2\nACGT\n+\nIIII\n")
    (chunk,) = read_fastq_chunks(path)
    assert chunk.count == 2
    assert np.array_equal(chunk.lengths(), [2, 4])
    assert chunk.record_id(0) == b"n1"
    assert chunk.record_id(1) == b"n2"

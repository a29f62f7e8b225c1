"""Regression tests for review findings (paired-chunk realignment,
edit-mode short keys, Illumina mate sync, components, contains edge)."""

import gzip

import numpy as np
import pytest

from fastqdedup_tpu.ops.components import connected_components_host
from fastqdedup_tpu.pipeline import deduplicate_cluster


def write_fastq_gz(path, records):
    with gzip.open(path, "wt") as f:
        for name, seq, qual in records:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def test_paired_files_with_short_native_chunks_not_truncated(tmp_path):
    """Records larger than the native parser's per-record byte estimate
    force short mid-file chunks; the lockstep zip must realign instead of
    truncating (every record must reach the output pass)."""
    n = 600
    # 600 records x 600 bp >> the parser's 256-byte/record estimate.
    records = [(f"r{i} 1:N:0:x", "ACGT" * 150, "I" * 600)
               for i in range(n)]
    r1 = tmp_path / "r1.fastq.gz"
    r2 = tmp_path / "r2.fastq.gz"
    write_fastq_gz(r1, records)
    write_fastq_gz(r2, [(f"r{i} 2:N:0:x", s, q)
                        for i, (_, s, q) in enumerate(records)])
    o1 = tmp_path / "o1.fastq.gz"
    o2 = tmp_path / "o2.fastq.gz"
    # Small chunks + all-unique keys: every record must survive.
    deduplicate_cluster([str(r1), str(r2)], [str(o1), str(o2)], None,
                        0, 1.0, chunk_records=128)
    out = gzip.open(o1, "rb").read()
    # All 600 records are exact duplicates of each other (same sequence),
    # so exactly one distinct key survives; the point is no crash and no
    # silent truncation mid-stream.
    assert out.count(b"@r0 ") == 1


def test_paired_realignment_distinct_records(tmp_path):
    """Same as above but with all-distinct records: every one must be
    written even when chunk boundaries drift between files."""
    n = 500
    rng = np.random.default_rng(0)
    seqs = ["".join("ACGT"[b] for b in rng.integers(0, 4, 400))
            for _ in range(n)]
    r1 = tmp_path / "r1.fastq.gz"
    r2 = tmp_path / "r2.fastq.gz"
    write_fastq_gz(r1, [(f"r{i} 1:N:0:x", s, "I" * 400)
                        for i, s in enumerate(seqs)])
    write_fastq_gz(r2, [(f"r{i} 2:N:0:x", s, "I" * 400)
                        for i, s in enumerate(seqs)])
    o1 = tmp_path / "o1.fastq.gz"
    o2 = tmp_path / "o2.fastq.gz"
    deduplicate_cluster([str(r1), str(r2)], [str(o1), str(o2)], None,
                        0, 1.0, chunk_records=64)
    assert gzip.open(o1, "rb").read().count(b"@r") == n
    assert gzip.open(o2, "rb").read().count(b"@r") == n


def test_illumina_comment_headers_pass_mate_check(tmp_path):
    records = [("x:1:2:3 1:N:0:ACGT", "ACGTACGT", "IIIIIIII"),
               ("y:1:2:4 1:N:0:ACGT", "ACGTACGA", "IIIIIIII")]
    r1 = tmp_path / "r1.fastq.gz"
    r2 = tmp_path / "r2.fastq.gz"
    write_fastq_gz(r1, records)
    write_fastq_gz(r2, [(name.replace(" 1:", " 2:"), s, q)
                        for name, s, q in records])
    deduplicate_cluster([str(r1), str(r2)],
                        [str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")],
                        None, 1, 1.0)  # must not raise


def test_desynced_pairs_raise(tmp_path):
    from fastqdedup_tpu.io.fastq import FastqFormatError
    r1 = tmp_path / "r1.fastq.gz"
    r2 = tmp_path / "r2.fastq.gz"
    write_fastq_gz(r1, [("a/1", "ACGT", "IIII"), ("b/1", "ACGT", "IIII")])
    write_fastq_gz(r2, [("a/2", "ACGT", "IIII"), ("c/2", "ACGT", "IIII")])
    with pytest.raises(FastqFormatError, match="not mates"):
        deduplicate_cluster(
            [str(r1), str(r2)],
            [str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")],
            None, 1, 1.0)


def test_edit_mode_links_keys_shorter_than_distance():
    """Keys of length <= max_distance have zero-width pigeonhole segments;
    the candidate generator must still link them (lev("A","C") == 1)."""
    from fastqdedup_tpu.engine import build_partition
    rng = np.random.default_rng(1)
    keys = [b"A", b"C"]
    # Enough long keys to push past the host brute-force path.
    keys += [bytes(rng.choice([65, 67, 71, 84], 30).astype(np.uint8))
             for _ in range(400)]
    part = build_partition(keys, 1, use_edit_distance=True)
    labels_of = {0: None, 1: None}
    for c in range(part.num_clusters):
        members = part.order[part.starts[c]:part.ends[c]]
        for m in members:
            if m in (0, 1):
                labels_of[int(m)] = c
    assert labels_of[0] == labels_of[1], "A and C must share a cluster"


def test_contains_within_no_empty_key_false_positive():
    from fastqdedup_tpu.engine import contains_within
    rng = np.random.default_rng(2)
    keys = [b""] + [bytes(rng.choice([65, 67, 71, 84], 12).astype(np.uint8))
                    for _ in range(400)]
    assert not contains_within(keys, b"NNNNNNNNNNNN", 1, False)
    assert contains_within(keys, b"", 1, False)  # empty matches empty


def test_connected_components_vectorized_matches_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        e = int(rng.integers(0, 80))
        ei = rng.integers(0, n, size=e).astype(np.int64)
        ej = rng.integers(0, n, size=e).astype(np.int64)
        labels = connected_components_host(n, ei, ej)
        # Brute force via adjacency closure.
        adj = np.eye(n, dtype=bool)
        adj[ei, ej] = True
        adj[ej, ei] = True
        for _ in range(n):
            adj = adj | (adj @ adj)
        want = np.array([np.flatnonzero(adj[i]).min() for i in range(n)])
        np.testing.assert_array_equal(labels, want)


def test_threaded_pipeline_stress_many_small_chunks(tmp_path):
    """Concurrency stress: tiny chunks maximize handoffs between the parse
    thread, accumulate worker, and writer thread; repeated runs must stay
    deterministic and identical."""
    import gzip
    import random

    from fastqdedup_tpu.pipeline import deduplicate_cluster

    rng = random.Random(99)
    records = []
    for i in range(3000):
        seq = "".join(rng.choice("ACGT") for _ in range(12))
        records.append(f"@r{i} z\n{seq}\n+\n{'I' * 12}\n")
    src = tmp_path / "in.fastq.gz"
    with gzip.open(src, "wt") as f:
        f.write("".join(records))
    outputs = []
    for run in range(3):
        out = tmp_path / f"out{run}.fastq.gz"
        deduplicate_cluster([str(src)], [str(out)], None, 1, 1.0,
                            chunk_records=7)  # 429 chunks
        outputs.append(gzip.open(out, "rb").read())
    assert outputs[0] == outputs[1] == outputs[2]
    assert outputs[0]


def test_writer_thread_error_propagates(tmp_path):
    """A failing output stream must surface as an exception on the caller,
    not hang the writer thread."""
    import gzip
    import random

    import pytest

    from fastqdedup_tpu.pipeline import deduplicate_cluster

    rng = random.Random(98)
    records = []
    for i in range(500):
        seq = "".join(rng.choice("ACGT") for _ in range(12))
        records.append(f"@r{i} z\n{seq}\n+\n{'I' * 12}\n")
    src = tmp_path / "in.fastq.gz"
    with gzip.open(src, "wt") as f:
        f.write("".join(records))
    bad_out = tmp_path / "no_such_dir" / "out.fastq.gz"
    with pytest.raises(OSError):
        deduplicate_cluster([str(src)], [str(bad_out)], None, 1, 1.0)


def test_prefetch_cancel_on_consumer_error(tmp_path):
    """Abandoning the chunk iterator mid-stream must unblock and not leak
    a stuck producer thread."""
    import gzip
    import threading

    from fastqdedup_tpu.pipeline import _zip_chunks

    src = tmp_path / "in.fastq.gz"
    records = [f"@r{i} z\nACGTACGT\n+\nIIIIIIII\n" for i in range(5000)]
    with gzip.open(src, "wt") as f:
        f.write("".join(records))
    before = threading.active_count()
    it = _zip_chunks([str(src)], chunk_records=16)
    next(it)
    it.close()  # generator close triggers the finally-drain path
    # The producer daemon thread must exit promptly.
    import time
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before

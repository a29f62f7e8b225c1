"""End-to-end pipeline parity tests against the pure-Python oracle.

The reference has no end-to-end tests (SURVEY.md section 4); these cover the
BASELINE.json configs: single-end UMI data for all three dissection methods,
paired-end with --check-lengths, three-file (R1+R2+UMI) input, quality
filtering, and the --edit Levenshtein mode.
"""

import gzip
import random

import pytest

from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS
from fastqdedup_tpu.pipeline import deduplicate_cluster

from oracle import oracle_dedup


def _make_fastq(path, records):
    data = "".join(f"@{name}\n{seq}\n+\n{qual}\n"
                   for name, seq, qual in records)
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(data.encode())
    else:
        with open(path, "wb") as f:
            f.write(data.encode())


def _random_reads(rng, n, length, dup_rate=0.6, error_rate=0.02,
                  quality_range=(30, 40), mate_suffix=""):
    reads = []
    molecules = []
    for i in range(n):
        if molecules and rng.random() < dup_rate:
            seq = list(rng.choice(molecules))
            for p in range(len(seq)):
                if rng.random() < error_rate:
                    seq[p] = rng.choice("ACGT")
            seq = "".join(seq)
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(length))
            molecules.append(seq)
        qual = "".join(chr(33 + rng.randrange(*quality_range))
                       for _ in range(length))
        # Sprinkle a few low-quality records to exercise the filter.
        if rng.random() < 0.05:
            qual = chr(33 + 2) * length
        reads.append((f"read{i}{mate_suffix}", seq, qual))
    return reads


def _read_out(path):
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        return f.read()


def _run_both(tmp_path, input_lists, check_slices=None, max_distance=1,
              max_average_error_rate=0.001, method="directional",
              use_edit_distance=False):
    inputs = []
    for idx, records in enumerate(input_lists):
        path = str(tmp_path / f"in{idx}.fastq.gz")
        _make_fastq(path, records)
        inputs.append(path)
    got_out = [str(tmp_path / f"got{idx}.fastq.gz")
               for idx in range(len(inputs))]
    exp_out = [str(tmp_path / f"exp{idx}.fastq.gz")
               for idx in range(len(inputs))]
    deduplicate_cluster(
        inputs, got_out, check_slices, max_distance,
        max_average_error_rate, CLUSTER_DISSECTION_METHODS[method],
        use_edit_distance, chunk_records=37)  # small chunks stress batching
    oracle_dedup(inputs, exp_out, check_slices, max_distance,
                 max_average_error_rate, method, use_edit_distance)
    for got, exp in zip(got_out, exp_out):
        assert _read_out(got) == _read_out(exp)
    return got_out


@pytest.mark.parametrize("method", ["highest_count", "adjacency",
                                    "directional"])
def test_single_end_parity(tmp_path, method):
    rng = random.Random(42)
    reads = _random_reads(rng, 300, 20)
    _run_both(tmp_path, [reads], method=method)


def test_single_end_no_quality_filter(tmp_path):
    rng = random.Random(43)
    reads = _random_reads(rng, 200, 16)
    _run_both(tmp_path, [reads], max_average_error_rate=1.0)


def test_paired_end_check_lengths(tmp_path):
    rng = random.Random(44)
    r1 = _random_reads(rng, 250, 24, mate_suffix="/1")
    r2 = [(name.replace("/1", "/2"),
           "".join(rng.choice("ACGT") for _ in range(24)),
           qual) for name, seq, qual in r1]
    from fastqdedup_tpu import length_string_to_slices
    slices = length_string_to_slices("16,8")
    _run_both(tmp_path, [r1, r2], check_slices=slices)


def test_three_files_umi_adjacency_d2(tmp_path):
    rng = random.Random(45)
    r1 = _random_reads(rng, 150, 20, mate_suffix="")
    r2 = [(name, "".join(rng.choice("ACGT") for _ in range(20)), qual)
          for name, seq, qual in r1]
    umi = [(name, "".join(rng.choice("ACGT") for _ in range(8)),
            "I" * 8) for name, seq, qual in r1]
    from fastqdedup_tpu import length_string_to_slices
    slices = length_string_to_slices("8,8,8")
    _run_both(tmp_path, [r1, r2, umi], check_slices=slices,
              max_distance=2, method="adjacency")


def test_edit_distance_mode(tmp_path):
    rng = random.Random(46)
    reads = _random_reads(rng, 120, 14)
    # Inject indel variants so edit mode differs from Hamming.
    extra = []
    for name, seq, qual in reads[:20]:
        extra.append((name + "i", seq[1:], qual[1:]))
        extra.append((name + "j", seq + "A", qual + "I"))
    _run_both(tmp_path, [reads + extra], method="directional",
              use_edit_distance=True)


def test_distance_zero_exact_dedup(tmp_path):
    rng = random.Random(47)
    reads = _random_reads(rng, 150, 10, error_rate=0.0)
    _run_both(tmp_path, [reads], max_distance=0)


def test_uncompressed_output(tmp_path):
    rng = random.Random(48)
    reads = _random_reads(rng, 80, 12)
    inputs = [str(tmp_path / "in.fastq")]
    _make_fastq(inputs[0], reads)
    out = [str(tmp_path / "out.fastq")]
    exp = [str(tmp_path / "exp.fastq")]
    deduplicate_cluster(
        inputs, out, None, 1, 0.001,
        CLUSTER_DISSECTION_METHODS["directional"], False, chunk_records=16)
    oracle_dedup(inputs, exp, None, 1, 0.001, "directional", False)
    assert _read_out(out[0]) == _read_out(exp[0])


def test_arity_validation(tmp_path):
    with pytest.raises(ValueError, match="Amount of output files"):
        deduplicate_cluster(["a.fastq"], [], None)
    with pytest.raises(ValueError, match="Amount of check lengths"):
        deduplicate_cluster(["a.fastq"], ["b.fastq"],
                            [slice(8), slice(8)])


def test_memory_budget_fallback_restreams(tmp_path, monkeypatch):
    """With a zero in-RAM budget, pass 3 re-streams inputs from disk and
    produces identical output."""
    import gzip

    from fastqdedup_tpu.pipeline import deduplicate_cluster

    src = tmp_path / "in.fastq.gz"
    records = []
    for i in range(50):
        seq = "ACGTACGTACGT" if i % 2 else "ACGTACGTACGA"
        records.append(f"@r{i} x\n{seq}\n+\n{'I' * 12}\n")
    with gzip.open(src, "wt") as f:
        f.write("".join(records))

    out_cached = tmp_path / "cached.fastq.gz"
    out_stream = tmp_path / "streamed.fastq.gz"
    deduplicate_cluster([str(src)], [str(out_cached)], None, 1, 1.0)
    # A 1-byte budget drops the chunk cache immediately AND abandons the
    # record arena after its first part, forcing the re-stream path.
    monkeypatch.setenv("FASTQDEDUP_MEMORY_LIMIT", "1")
    deduplicate_cluster([str(src)], [str(out_stream)], None, 1, 1.0)
    assert gzip.open(out_cached, "rb").read() == \
        gzip.open(out_stream, "rb").read()


def test_record_arena_paths_byte_identical(tmp_path, monkeypatch):
    """All three pass-3 strategies produce the same bytes: record arena
    (default), chunk cache (arena off), and re-stream (no cache)."""
    import gzip

    from fastqdedup_tpu.pipeline import deduplicate_cluster

    rng = random.Random(17)
    reads = _random_reads(rng, 400, 24)
    src1 = tmp_path / "r1.fastq.gz"
    src2 = tmp_path / "r2.fastq.gz"
    _make_fastq(src1, [(f"{n} 1:x", s, q) for n, s, q in reads])
    _make_fastq(src2, [(f"{n} 2:x", s[::-1], q) for n, s, q in reads])
    inputs = [str(src1), str(src2)]

    def run(tag):
        outs = [str(tmp_path / f"{tag}_{i}.fastq.gz") for i in (1, 2)]
        deduplicate_cluster(inputs, outs, None, 1, 0.001)
        return [gzip.open(o, "rb").read() for o in outs]

    arena = run("arena")
    monkeypatch.setenv("FASTQDEDUP_RECORD_ARENA", "0")
    cached = run("cached")
    monkeypatch.setenv("FASTQDEDUP_MEMORY_LIMIT", "1")
    streamed = run("streamed")
    assert arena == cached == streamed
    assert any(len(x) for x in arena)


def test_parity_through_device_kernel_path(tmp_path, monkeypatch):
    """Force the engine past the host brute-force budget so end-to-end
    output parity covers the bucket + Pallas tile kernel path (interpret
    mode on CPU)."""
    import fastqdedup_tpu.engine as engine

    monkeypatch.setattr(engine, "_HOST_BYTE_OP_BUDGET", 1)
    monkeypatch.setattr(engine, "HOST_LIMIT", 8)
    rng = random.Random(46)
    reads = _random_reads(rng, 400, 20)
    _run_both(tmp_path, [reads], method="directional")
    _run_both(tmp_path, [reads], method="adjacency", max_distance=2)


def test_custom_dissection_with_unknown_keys(tmp_path):
    """A user-supplied dissection strategy may yield strings that are not
    cluster keys; the reference silently never matched them in pass 3
    (__init__.py:203-206), so they must be ignored, not crash or mark a
    neighboring real key."""

    def weird_strategy(cluster, max_distance, use_edit_distance):
        yield "ZZZZZZZZZZZZZZZZZZZZ"   # unknown, sorts past every key
        yield "AAAAAAAAAAAAAAAAAAAA"   # unknown, insertion point 0
        yield "NOT_A_KEY_LENGTH"       # unknown length entirely
        yield max(cluster)[1]          # one real representative

    rng = random.Random(47)
    reads = _random_reads(rng, 120, 20)
    inputs = [str(tmp_path / "in.fastq.gz")]
    _make_fastq(inputs[0], reads)
    got = [str(tmp_path / "got.fastq.gz")]
    exp = [str(tmp_path / "exp.fastq.gz")]
    deduplicate_cluster(inputs, got, None, 1, 1.0, weird_strategy, False)
    oracle_dedup(inputs, exp, None, 1, 1.0, weird_strategy, False)
    assert _read_out(got[0]) == _read_out(exp[0])


def test_device_quality_filter_flag(tmp_path, monkeypatch):
    """FASTQDEDUP_DEVICE_QUALITY=1 routes the pass-1 quality filter through
    the device LUT kernel (ops/phred.py) with identical keep/drop decisions
    on this data (thresholds far from f32 rounding boundaries)."""
    rng = random.Random(48)
    reads = _random_reads(rng, 200, 20)
    inputs = [str(tmp_path / "in.fastq.gz")]
    _make_fastq(inputs[0], reads)
    out_host = [str(tmp_path / "host.fastq.gz")]
    out_dev = [str(tmp_path / "dev.fastq.gz")]
    deduplicate_cluster(inputs, out_host, None, 1, 0.001)
    monkeypatch.setenv("FASTQDEDUP_DEVICE_QUALITY", "1")
    deduplicate_cluster(inputs, out_dev, None, 1, 0.001)
    assert _read_out(out_host[0]) == _read_out(out_dev[0])


def test_numpy_fallback_accumulator_and_renderer(tmp_path, monkeypatch):
    """Without the native library the pure-numpy accumulator and renderer
    must produce byte-identical output (both paths track counts and
    first-occurrence positions)."""
    import fastqdedup_tpu.pipeline as pl

    rng = random.Random(49)
    reads = _random_reads(rng, 300, 20)
    inputs = [str(tmp_path / "in.fastq.gz")]
    _make_fastq(inputs[0], reads)
    native_out = [str(tmp_path / "native.fastq.gz")]
    fallback_out = [str(tmp_path / "fallback.fastq.gz")]
    deduplicate_cluster(inputs, native_out, None, 1, 0.001)
    monkeypatch.setattr(pl, "_make_key_accumulator",
                        lambda expected=0: pl._NumpyKeyAccumulator(expected))
    monkeypatch.delattr("fastqdedup_tpu.native.loader.render_records_native")
    # Also force pass 3's searchsorted membership path (no C hash lookup).
    monkeypatch.delattr("fastqdedup_tpu.native.loader.KeyAccumulator")
    deduplicate_cluster(inputs, fallback_out, None, 1, 0.001)
    assert _read_out(native_out[0]) == _read_out(fallback_out[0])


def test_edit_two_member_mixed_length_count_tie(tmp_path):
    """Edit mode: a two-member cluster whose keys differ in LENGTH and
    tie on count must tie-break on string order (the vectorized pad
    must span both sides' widths — regression: independent padding
    raised a broadcast error)."""
    # AAAAAAAA (8) and AAAAAAA (7): lev distance 1, both count 1.
    reads = [("r0 x", "AAAAAAAA", "IIIIIIII"),
             ("r1 x", "AAAAAAA", "IIIIIII"),
             ("r2 x", "CCCCCCCC", "IIIIIIII")]
    src = str(tmp_path / "in.fastq.gz")
    _make_fastq(src, reads)
    got = [str(tmp_path / "got.fastq.gz")]
    exp = [str(tmp_path / "exp.fastq.gz")]
    deduplicate_cluster([src], got, None, 1, 1.0,
                        CLUSTER_DISSECTION_METHODS["directional"], True,
                        chunk_records=2)
    oracle_dedup([src], exp, None, 1, 1.0, "directional", True)
    assert _read_out(got[0]) == _read_out(exp[0])

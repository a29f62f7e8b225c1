"""CLI surface tests (reference __init__.py:305-412 flag parity)."""

import gzip
import random
import sys

import pytest

from fastqdedup_tpu.cli import argument_parser, main


def test_defaults():
    args = argument_parser().parse_args(["r1.fastq"])
    assert args.fastq == ["r1.fastq"]
    assert args.max_distance == 1
    assert args.max_average_error_rate == 0.001
    assert args.cluster_dissection_method == "directional"
    assert args.prefix == "fastqdedup_R"
    assert not args.edit
    assert args.output is None


def test_no_error_rate_filter_flag():
    args = argument_parser().parse_args(["-E", "r1.fastq"])
    assert args.max_average_error_rate == 1.0


def test_repeatable_output():
    args = argument_parser().parse_args(
        ["-o", "a.fastq", "-o", "b.fastq", "r1.fastq", "r2.fastq"])
    assert args.output == ["a.fastq", "b.fastq"]


def test_verbosity_stacking():
    args = argument_parser().parse_args(["-vv", "-q", "r1.fastq"])
    assert args.verbose == 2
    assert args.quiet == 1


@pytest.mark.parametrize("method", ["highest_count", "adjacency",
                                    "directional"])
def test_method_choices(method):
    args = argument_parser().parse_args(["-c", method, "r.fastq"])
    assert args.cluster_dissection_method == method


def test_main_end_to_end(tmp_path, monkeypatch):
    rng = random.Random(1)
    records = []
    for i in range(50):
        seq = "".join(rng.choice("ACGT") for _ in range(12))
        records.append(f"@r{i}\n{seq}\n+\n{'I' * 12}\n")
    src = tmp_path / "in.fastq.gz"
    with gzip.open(src, "wb") as f:
        f.write("".join(records).encode())
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv",
                        ["fastqdedup", "-q", str(src)])
    main()
    # Default output naming: prefix + 1-based index (reference :391-392).
    out = tmp_path / "fastqdedup_R1.fastq.gz"
    assert out.exists()
    with gzip.open(out, "rb") as f:
        payload = f.read()
    assert payload.startswith(b"@r")
    assert payload.count(b"\n") % 4 == 0


@pytest.mark.parametrize("ext", ["gz", "bz2", "xz", "zst"])
def test_compressed_format_round_trip(ext, tmp_path, monkeypatch):
    """xopen parity: every codec the reference's xopen handles
    transparently (.gz/.bz2/.xz/.zst) round-trips through the CLI."""
    if ext == "zst":
        pytest.importorskip("zstandard")
    from fastqdedup_tpu.io.opener import xopen

    rng = random.Random(3)
    records = []
    for i in range(40):
        seq = "".join(rng.choice("ACGT") for _ in range(16))
        records.append(f"@r{i}\n{seq}\n+\n{'I' * 16}\n")
    payload = "".join(records).encode()
    src = tmp_path / f"in.fastq.{ext}"
    with xopen(str(src), "wb") as f:
        f.write(payload)
    with xopen(str(src), "rb") as f:
        assert f.read() == payload

    out = tmp_path / f"out.fastq.{ext}"
    monkeypatch.setattr(sys, "argv", [
        "fastqdedup", "-q", "-o", str(out), str(src)])
    main()
    with xopen(str(out), "rb") as f:
        result = f.read()
    assert result.startswith(b"@r")
    assert result.count(b"\n") % 4 == 0

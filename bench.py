"""End-to-end benchmark: reads/s over the full dedup pipeline.

Generates a deterministic synthetic UMI FASTQ (duplicate-heavy, with
sequencing errors and quality variation), runs the complete
``deduplicate_cluster`` pipeline (ingest + quality filter + TPU clustering +
dissection + gz rewrite), and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is reported against the north-star target of 1e6 reads/s
end-to-end derived from BASELINE.json's 100M-read goal.

Env knobs: BENCH_READS (default 200000), BENCH_READ_LEN (default 100),
BENCH_UMI_LEN (default 12), BENCH_METHOD (default directional).
"""

import gzip
import json
import os
import random
import sys
import tempfile
import time

BASELINE_READS_PER_SEC = 1_000_000.0


def generate_fastq(path: str, n_reads: int, read_len: int,
                   umi_len: int, seed: int = 7) -> None:
    rng = random.Random(seed)
    n_molecules = max(n_reads // 5, 1)
    bases = "ACGT"
    molecules = ["".join(rng.choice(bases) for _ in range(umi_len))
                 + "".join(rng.choice(bases)
                           for _ in range(read_len - umi_len))
                 for _ in range(n_molecules)]
    chunk = []
    with gzip.open(path, "wb", compresslevel=1) as f:
        for i in range(n_reads):
            seq = molecules[rng.randrange(n_molecules)]
            if rng.random() < 0.15:  # ~1/1000-per-base error at 150bp scale
                pos = rng.randrange(read_len)
                seq = seq[:pos] + rng.choice(bases) + seq[pos + 1:]
            qual = "".join(chr(33 + rng.randrange(30, 41))
                           for _ in range(read_len))
            chunk.append(f"@read{i}\n{seq}\n+\n{qual}\n")
            if len(chunk) == 10000:
                f.write("".join(chunk).encode())
                chunk.clear()
        if chunk:
            f.write("".join(chunk).encode())


def main() -> None:
    n_reads = int(os.environ.get("BENCH_READS", 200_000))
    read_len = int(os.environ.get("BENCH_READ_LEN", 100))
    umi_len = int(os.environ.get("BENCH_UMI_LEN", 12))
    method = os.environ.get("BENCH_METHOD", "directional")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fastqdedup_tpu.dissect import CLUSTER_DISSECTION_METHODS
    from fastqdedup_tpu.pipeline import deduplicate_cluster

    workdir = tempfile.mkdtemp(prefix="fastqdedup_bench_")
    src = os.path.join(workdir, "bench.fastq.gz")
    out = os.path.join(workdir, "bench_dedup.fastq.gz")
    generate_fastq(src, n_reads, read_len, umi_len)

    # Warm the JAX kernels on a small prefix so the measured run reflects
    # steady-state throughput rather than one-time compilation.
    warm_src = os.path.join(workdir, "warm.fastq.gz")
    warm_out = os.path.join(workdir, "warm_out.fastq.gz")
    generate_fastq(warm_src, min(20_000, n_reads), read_len, umi_len,
                   seed=11)
    deduplicate_cluster([warm_src], [warm_out], None, 1, 0.001,
                        CLUSTER_DISSECTION_METHODS[method], False)

    start = time.perf_counter()
    deduplicate_cluster([src], [out], None, 1, 0.001,
                        CLUSTER_DISSECTION_METHODS[method], False)
    elapsed = time.perf_counter() - start

    reads_per_sec = n_reads / elapsed
    print(json.dumps({
        "metric": f"end-to-end dedup throughput "
                  f"({n_reads} reads, {read_len}bp, {method})",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()

"""Multi-host helpers (single-process behavior + partition laws)."""

import numpy as np
import pytest

from fastqdedup_tpu.parallel.distributed import (
    merge_kept_keys,
    partition_buckets_by_hash,
    shard_for_host,
)


def test_shard_for_host_partitions_completely():
    items = list(range(17))
    shards = [shard_for_host(items, process_id=p, num_processes=4)
              for p in range(4)]
    flat = sorted(x for s in shards for x in s)
    assert flat == items
    assert all(len(s) in (4, 5) for s in shards)


def test_shard_for_host_single_process_identity():
    items = ["a.fastq", "b.fastq"]
    assert shard_for_host(items) == items


def test_merge_kept_keys_single_process():
    kept = {b"ACGT", b"TTTT"}
    assert merge_kept_keys(kept) == kept


def test_partition_buckets_by_hash_stable_and_complete():
    keys = [bytes([65 + (i % 26)]) * 3 + bytes([i % 250])
            for i in range(200)]
    shards = partition_buckets_by_hash(keys, 4)
    flat = sorted(i for s in shards for i in s)
    assert flat == list(range(200))
    # Deterministic across calls.
    assert shards == partition_buckets_by_hash(keys, 4)
    # Equal keys always land on the same shard.
    keys2 = [b"same"] * 50
    shards2 = partition_buckets_by_hash(keys2, 8)
    non_empty = [s for s in shards2 if s]
    assert len(non_empty) == 1


def test_bucket_round_robin_multi_device():
    """Bucket batches distribute across local devices and results merge
    identically to single-device execution (8 virtual CPU devices)."""
    import jax

    from fastqdedup_tpu.ops.bucket import hamming_neighbor_pairs_bucketed
    from fastqdedup_tpu.ops.encode import EncodeTable, keys_to_matrix

    assert jax.device_count() >= 2  # conftest forces 8 virtual devices
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, size=(400, 24), dtype=np.uint8)
    matrix = np.repeat(base, 3, axis=0)
    for i in range(0, len(matrix), 3):
        matrix[i + 1, rng.integers(24)] = rng.integers(4)
    ii, jj = hamming_neighbor_pairs_bucketed(matrix, 5, 1)
    want = (matrix[:, None, :] != matrix[None, :, :]).sum(2) <= 1
    wi, wj = np.nonzero(np.triu(want, k=1))
    got = set(zip(ii.tolist(), jj.tolist()))
    assert got == set(zip(wi.tolist(), wj.tolist()))


@pytest.mark.parametrize("shard_hash", [False, True])
def test_two_process_jax_distributed_parity(tmp_path, shard_hash):
    """Real 2-process jax.distributed run: both processes execute the SAME
    deduplicate_cluster invocation on the same inputs; the merged output
    must be byte-identical to a single-host run.  (VERDICT round 1 item 1:
    per-host chunk shards, bucket-hash pair ownership, vectorized kept-key
    exchange.)

    ``shard_hash=True`` forces the sharded bucket-hash exchange (each
    host hashes 1/P of the rows, one hash-column all-gather; production
    gate is >= 2^20 rows) so its collective path is exercised by a real
    multi-process run, not just the simulated-shard contract tests."""
    import gzip
    import os
    import random
    import socket
    import subprocess
    import sys

    rng = random.Random(77)
    mols = ["".join(rng.choice("ACGT") for _ in range(24))
            for _ in range(60)]
    records = []
    for i in range(800):
        seq = list(rng.choice(mols))
        if rng.random() < 0.25:
            seq[rng.randrange(24)] = rng.choice("ACGT")
        qual = "".join(chr(33 + rng.randrange(25, 40)) for _ in range(24))
        records.append(f"@r{i} c\n{''.join(seq)}\n+\n{qual}\n")
    src = tmp_path / "in.fastq.gz"
    with gzip.open(src, "wt") as f:
        f.write("".join(records))

    single_out = tmp_path / "single.fastq.gz"
    from fastqdedup_tpu.pipeline import deduplicate_cluster
    # Small chunks so the 2-process run actually interleaves ownership.
    deduplicate_cluster([str(src)], [str(single_out)], None, 1, 0.001,
                        chunk_records=64)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    driver = tmp_path / "driver.py"
    dist_out = tmp_path / "dist.fastq.gz"
    driver.write_text(f"""
import sys
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2,
                           process_id=int(sys.argv[1]))
assert jax.process_count() == 2, "distributed init was a no-op"
from fastqdedup_tpu.pipeline import deduplicate_cluster
deduplicate_cluster([{str(src)!r}], [{str(dist_out)!r}], None, 1, 0.001,
                    chunk_records=64)
""")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    if shard_hash:
        env["FASTQDEDUP_SHARD_HASH_MIN_ROWS"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Deliberately EXCLUDE any inherited PYTHONPATH: this machine's
    # sitecustomize imports jax at interpreter startup, which initializes
    # backends before jax.distributed.initialize can run and silently
    # leaves process_count() at 1 (the test would pass vacuously).
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen([sys.executable, str(driver), str(p)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for p in range(2)]
    outputs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out.decode("utf-8", "replace")[-3000:]

    assert gzip.open(single_out, "rb").read() == \
        gzip.open(dist_out, "rb").read()
    assert gzip.open(dist_out, "rb").read()  # non-empty


def test_bucket_shard_union_equals_full():
    """The per-host bucket partition is exact: the union of every shard's
    pair output equals the unsharded output, and shards are disjoint units
    of work (a bucket is computed by exactly one host)."""
    import numpy as np

    from fastqdedup_tpu.ops.bucket import hamming_neighbor_pairs_bucketed

    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, size=(900, 20), dtype=np.uint8)
    matrix = np.repeat(base, 4, axis=0)[:3000]
    for i in range(0, len(matrix) - 1, 4):
        matrix[i + 1, rng.integers(20)] = rng.integers(4)
    full_i, full_j = hamming_neighbor_pairs_bucketed(
        matrix, 5, 1, large_bucket_threshold=32)
    full = set(zip(full_i.tolist(), full_j.tolist()))
    for nproc in (2, 3):
        union = set()
        for p in range(nproc):
            si, sj = hamming_neighbor_pairs_bucketed(
                matrix, 5, 1, large_bucket_threshold=32, shard=(p, nproc))
            union |= set(zip(si.tolist(), sj.tolist()))
        assert union == full


def test_edit_shard_union_equals_full():
    """Edit-mode verification striding across hosts is exact."""
    import numpy as np

    from fastqdedup_tpu.engine import (
        _edit_edges_entries,
        _entries_from_keys,
        _group_by_length,
    )
    from fastqdedup_tpu.ops.encode import EncodeTable
    from fastqdedup_tpu.parallel.distributed import allgather_int64_pairs

    rng = np.random.default_rng(12)
    keys = []
    for _ in range(300):
        k = "".join("ACGT"[c] for c in rng.integers(0, 4, 18))
        keys.append(k.encode())
        if rng.random() < 0.5:
            mutated = bytearray(k.encode())
            op = rng.integers(3)
            pos = rng.integers(len(mutated))
            if op == 0:
                mutated[pos] = ord("ACGT"[rng.integers(4)])
            elif op == 1:
                del mutated[pos]
            else:
                mutated.insert(pos, ord("ACGT"[rng.integers(4)]))
            keys.append(bytes(mutated))
    table = EncodeTable("ACGTN")
    entries = _entries_from_keys(keys, _group_by_length(keys), table)
    fi, fj = _edit_edges_entries(entries, len(keys), 1)
    full = set(zip(fi.tolist(), fj.tolist()))
    union = set()
    for p in range(2):
        si, sj = _edit_edges_entries(entries, len(keys), 1, shard=(p, 2))
        union |= set(zip(si.tolist(), sj.tolist()))
    assert union == full


def test_two_process_sharded_input_parity(tmp_path):
    """FASTQDEDUP_SHARDED_INPUT=1: every host feeds its own input shard
    (parse/rewrite parallelize perfectly); the concatenation of the
    per-host outputs must equal the single-host run on the concatenated
    input."""
    import gzip
    import os
    import random
    import socket
    import subprocess
    import sys

    rng = random.Random(55)
    mols = ["".join(rng.choice("ACGT") for _ in range(22))
            for _ in range(50)]
    shards = [[], []]
    for i in range(900):
        seq = list(rng.choice(mols))
        if rng.random() < 0.25:
            seq[rng.randrange(22)] = rng.choice("ACGT")
        qual = "".join(chr(33 + rng.randrange(25, 40)) for _ in range(22))
        shards[0 if i < 450 else 1].append(
            f"@r{i} c\n{''.join(seq)}\n+\n{qual}\n")
    shard_paths = []
    for p, records in enumerate(shards):
        path = tmp_path / f"shard{p}.fastq.gz"
        with gzip.open(path, "wt") as f:
            f.write("".join(records))
        shard_paths.append(path)
    full = tmp_path / "full.fastq.gz"
    with gzip.open(full, "wt") as f:
        f.write("".join(shards[0] + shards[1]))

    from fastqdedup_tpu.pipeline import deduplicate_cluster
    single_out = tmp_path / "single.fastq.gz"
    deduplicate_cluster([str(full)], [str(single_out)], None, 1, 0.001,
                        chunk_records=64)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    driver = tmp_path / "driver.py"
    driver.write_text(f"""
import sys
import jax
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, "distributed init was a no-op"
from fastqdedup_tpu.pipeline import deduplicate_cluster
shards = [{str(shard_paths[0])!r}, {str(shard_paths[1])!r}]
outs = [{str(tmp_path / 'out0.fastq.gz')!r},
        {str(tmp_path / 'out1.fastq.gz')!r}]
deduplicate_cluster([shards[pid]], [outs[pid]], None, 1, 0.001,
                    chunk_records=64)
""")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FASTQDEDUP_SHARDED_INPUT"] = "1"
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Deliberately EXCLUDE any inherited PYTHONPATH: this machine's
    # sitecustomize imports jax at interpreter startup, which initializes
    # backends before jax.distributed.initialize can run and silently
    # leaves process_count() at 1 (the test would pass vacuously).
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen([sys.executable, str(driver), str(p)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for p in range(2)]
    outputs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out.decode("utf-8", "replace")[-3000:]

    merged = gzip.open(tmp_path / "out0.fastq.gz", "rb").read() + \
        gzip.open(tmp_path / "out1.fastq.gz", "rb").read()
    assert merged == gzip.open(single_out, "rb").read()
    assert merged


def test_owned_meta_merge_union_equals_full_merge():
    """The per-host owned metadata merges must union (over pid) to the
    full merge: every key once, summed counts, min first positions,
    zero-count keys dropped, rep = smallest gathered row of the key."""
    from fastqdedup_tpu.parallel.distributed import _owned_meta_merge

    rng = np.random.default_rng(11)
    n = 500
    # 60 distinct "keys" as (length, h1, h2) triples, repeated.
    triples = np.stack([rng.integers(5, 9, size=60),
                        rng.integers(0, 1 << 62, size=60),
                        rng.integers(0, 1 << 62, size=60)], axis=1)
    pick = rng.integers(0, 60, size=n)
    g_len = triples[pick, 0].astype(np.int64)
    g_h1 = triples[pick, 1].astype(np.uint64)
    g_h2 = triples[pick, 2].astype(np.uint64)
    g_cnt = rng.integers(0, 4, size=n).astype(np.int64)
    g_fp = rng.integers(0, 1 << 40, size=n).astype(np.int64)

    nproc = 3
    rep_all, cnt_all, fp_all, len_all = [], [], [], []
    for pid in range(nproc):
        rep, cnt, fp, ln = _owned_meta_merge(g_len, g_h1, g_h2, g_cnt,
                                             g_fp, pid, nproc)
        rep_all.append(rep)
        cnt_all.append(cnt)
        fp_all.append(fp)
        len_all.append(ln)
    rep = np.concatenate(rep_all)
    cnt = np.concatenate(cnt_all)
    fp = np.concatenate(fp_all)
    ln = np.concatenate(len_all)

    want = {}
    for i in range(n):
        key = (int(g_len[i]), int(g_h1[i]), int(g_h2[i]))
        c, f, r = want.get(key, (0, 1 << 62, 1 << 62))
        want[key] = (c + int(g_cnt[i]), min(f, int(g_fp[i])),
                     min(r, i))
    want = {k: v for k, v in want.items() if v[0] > 0}
    got = {(int(ln[i]), int(g_h1[rep[i]]), int(g_h2[rep[i]])):
           (int(cnt[i]), int(fp[i]), int(rep[i]))
           for i in range(len(rep))}
    assert got == want


def test_ragged_take_and_exchange_single_process():
    from fastqdedup_tpu.parallel.distributed import (
        _ragged_take,
        exchange_merge_key_tables,
    )
    keys = [b"ACGT", b"", b"TTTTTTT", b"AA"]
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    offsets = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum([len(k) for k in keys], out=offsets[1:])
    taken = _ragged_take(data, offsets, np.asarray([2, 0], dtype=np.int64))
    assert taken.tobytes() == b"TTTTTTTACGT"
    # Single-process exchange drops zero-count keys, keeps the rest.
    counts = np.asarray([2, 1, 0, 3], dtype=np.int64)
    fp = np.asarray([5, 6, 7, 8], dtype=np.int64)
    h1 = np.arange(4, dtype=np.uint64)
    h2 = np.arange(4, dtype=np.uint64)
    d2, o2, c2, f2 = exchange_merge_key_tables(
        data, offsets, counts, fp, h1, h2)
    got = [d2[o2[i]:o2[i + 1]].tobytes() for i in range(len(c2))]
    assert got == [b"ACGT", b"", b"AA"]
    assert c2.tolist() == [2, 1, 3] and f2.tolist() == [5, 6, 8]


def test_hash_ragged_matches_fixed_width():
    """Ragged and fixed-width hashing must agree on equal bytes (the
    exchange compares h2 across hosts whose tables differ in layout)."""
    import pytest
    pytest.importorskip("fastqdedup_tpu.native.loader")
    from fastqdedup_tpu.native.loader import (
        hash_ragged_native,
        hash_rows_native,
    )
    rng = np.random.default_rng(5)
    for w in (1, 7, 8, 17, 100):
        mat = rng.integers(0, 256, size=(50, w), dtype=np.uint8)
        offsets = np.arange(51, dtype=np.int64) * w
        a = hash_rows_native(mat, 12345, strong=True)
        b = hash_ragged_native(mat.reshape(-1), offsets, 12345,
                               strong=True)
        assert (a == b).all()
    # Mixed lengths in one table.
    keys = [b"A", b"ACGTACGT", b"ACGTACGTA", b""]
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    offsets = np.zeros(5, dtype=np.int64)
    np.cumsum([len(k) for k in keys], out=offsets[1:])
    h = hash_ragged_native(data, offsets, 7)
    # Equal contents hash equal; distinct contents distinct here.
    assert len(set(h.tolist())) == 4


def test_owned_meta_merge_tournament_rep_valid_and_balanced():
    """With host segment boundaries, the representative row must still
    belong to the key's duplicate run, the merge must stay identical,
    and payload contributions must spread across hosts (not all land on
    host 0 as the smallest-row rule would in strided ingest)."""
    from fastqdedup_tpu.parallel.distributed import _owned_meta_merge

    rng = np.random.default_rng(21)
    nhosts = 4
    n_keys = 4000
    # Every host holds every key (worst case for smallest-row skew).
    g_len = np.tile(np.full(n_keys, 20, dtype=np.int64), nhosts)
    h1 = rng.integers(0, 1 << 62, size=n_keys).astype(np.uint64)
    h2 = rng.integers(0, 1 << 62, size=n_keys).astype(np.uint64)
    g_h1 = np.tile(h1, nhosts)
    g_h2 = np.tile(h2, nhosts)
    g_cnt = np.ones(nhosts * n_keys, dtype=np.int64)
    g_fp = rng.integers(0, 1 << 30, size=nhosts * n_keys).astype(np.int64)
    host_starts = np.arange(nhosts + 1, dtype=np.int64) * n_keys

    reps, host_share = [], np.zeros(nhosts, dtype=np.int64)
    for pid in range(nhosts):
        rep, cnt, fp, ln = _owned_meta_merge(
            g_len, g_h1, g_h2, g_cnt, g_fp, pid, nhosts,
            host_starts=host_starts)
        assert (cnt == nhosts).all()
        # rep must be a row of the same key.
        key_of_rep = rep % n_keys
        assert (g_h1[rep] == h1[key_of_rep]).all()
        reps.append(rep)
        np.add.at(host_share, rep // n_keys, 1)
    assert sum(len(r) for r in reps) == n_keys
    # Tournament spreads reps across hosts: no host holds > 40% here.
    assert host_share.max() < 0.4 * n_keys, host_share.tolist()


@pytest.mark.parametrize("arena,readers,edit", [
    ("1", "1", False), ("0", "1", False), ("1", "3", False),
    ("0", "3", False), ("restream", "3", False), ("1", "3", True)])
def test_two_process_byte_range_ingest_parity(tmp_path, arena, readers,
                                              edit):
    """BGZF inputs in default multi-host mode take the byte-range ingest
    path (each host inflates+parses only its 1/P record range; record
    ordinals from the newline-count exchange) and the merged output must
    stay byte-identical to a single-host run.  Paired files of different
    compressed sizes force the per-file record realignment.  Runs all
    three pass-3 layouts (record arena, chunk cache, and — with a 1-byte
    memory limit — the re-stream path, which must re-read only the host
    window) and, with readers=3, each host's range further split across
    concurrent readers."""
    import gzip
    import os
    import random
    import socket
    import subprocess
    import sys

    from fastqdedup_tpu.io.bgzf import BGZF_EOF, compress_block

    rng = random.Random(99)
    mols = ["".join(rng.choice("ACGT") for _ in range(30))
            for _ in range(60)]
    r1, r2 = [], []
    for i in range(1200):
        seq = list(rng.choice(mols))
        if rng.random() < 0.25:
            seq[rng.randrange(30)] = rng.choice("ACGT")
        qual = "".join(chr(33 + rng.randrange(25, 40)) for _ in range(30))
        r1.append(f"@r{i}/1 c\n{''.join(seq)}\n+\n{qual}\n")
        # Mate file: shorter reads -> different compressed size/splits.
        seq2 = "".join(rng.choice("ACGT") for _ in range(12))
        qual2 = "".join(chr(33 + rng.randrange(25, 40)) for _ in range(12))
        r2.append(f"@r{i}/2 c\n{seq2}\n+\n{qual2}\n")
    srcs = [tmp_path / "in1.fastq.gz", tmp_path / "in2.fastq.gz"]
    for path, recs in zip(srcs, (r1, r2)):
        # Many small blocks so 2-host byte splits land mid-file.
        data = "".join(recs).encode()
        with open(path, "wb") as f:
            for off in range(0, len(data), 4096):
                f.write(compress_block(data[off:off + 4096], 1))
            f.write(BGZF_EOF)

    single = [tmp_path / "s1.fastq.gz", tmp_path / "s2.fastq.gz"]
    from fastqdedup_tpu.pipeline import deduplicate_cluster
    deduplicate_cluster([str(s) for s in srcs],
                        [str(o) for o in single], None, 1, 0.001,
                        use_edit_distance=edit, chunk_records=64)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    driver = tmp_path / "driver.py"
    dist = [tmp_path / "d1.fastq.gz", tmp_path / "d2.fastq.gz"]
    driver.write_text(f"""
import sys
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2,
                           process_id=int(sys.argv[1]))
assert jax.process_count() == 2, "distributed init was a no-op"
from fastqdedup_tpu import pipeline
from fastqdedup_tpu.pipeline import deduplicate_cluster

# Assert the byte-range plan actually activates for BGZF inputs.
plan = pipeline._plan_input_ranges(
    [{str(srcs[0])!r}, {str(srcs[1])!r}], jax.process_index(), 2)
assert plan, "byte-range ingest did not activate"
per_file, base = plan[0]
assert per_file[0][2] == per_file[1][2] > 0
deduplicate_cluster([{str(srcs[0])!r}, {str(srcs[1])!r}],
                    [{str(dist[0])!r}, {str(dist[1])!r}], None, 1, 0.001,
                    use_edit_distance={edit!r}, chunk_records=64)
""")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if arena == "restream":
        env["FASTQDEDUP_RECORD_ARENA"] = "0"
        env["FASTQDEDUP_MEMORY_LIMIT"] = "1"
    else:
        env["FASTQDEDUP_RECORD_ARENA"] = arena
    env["FASTQDEDUP_INGEST_READERS"] = readers
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen([sys.executable, str(driver), str(p)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for p in range(2)]
    outputs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out.decode("utf-8", "replace")[-3000:]

    for s_out, d_out in zip(single, dist):
        assert gzip.open(d_out, "rb").read() == \
            gzip.open(s_out, "rb").read()
        assert gzip.open(d_out, "rb").read()

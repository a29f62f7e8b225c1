"""Multi-host scaling-efficiency benchmark (BASELINE.json north star #4).

Strong scaling of the full dedup pipeline across P = 1, 2, 4 hosts in
sharded-input mode (the production layout: each host owns its per-lane
input shard, SURVEY §7 step 9).  Hosts are separate ``jax.distributed``
processes on this machine, each pinned to ONE core with ``taskset`` so a
P-host run uses exactly P cores — the closest honest model of P
single-node hosts this 4-core machine can express.  JAX_PLATFORMS=cpu:
the measurement targets the framework's distribution layer (per-host
parse, bucket-hash pair ownership, key-table allgather, kept-key
exchange), not chip kernels.

Fixed total work: the same reads split into 4 BGZF shard files; a P-host
run gives each host 4/P shards (byte-concatenation of BGZF files is
valid BGZF, so shards merge losslessly for smaller P).  Efficiency =
T(1) / (P * T(P)), with T = the slowest host's wall time measured from
the post-``jax.distributed.initialize`` barrier (all hosts aligned) to
pipeline completion.  Output parity is asserted every run: the
concatenated per-host outputs must equal the 1-host output byte for
byte.

Prints one JSON line:
    {"metric": "scaling_efficiency_4_hosts", "value": E, ...}

Env knobs: SCALE_READS (default 2000000), SCALE_READ_LEN (100),
SCALE_UMI_LEN (12), SCALE_PROCS (default "1,2,4").
"""

import gzip
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

import bench


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_DRIVER = """
import logging, os, sys, time
import jax

nproc = int(sys.argv[1])
pid = int(sys.argv[2])
port = sys.argv[3]
inputs = sys.argv[4].split(",")
output = sys.argv[5]
if os.environ.get("SCALE_DEBUG") == "1":
    logging.basicConfig(level=logging.DEBUG,
                        format="%(relativeCreated)8.0fms %(message)s")
    logging.getLogger("jax").setLevel(logging.WARNING)
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, "distributed init was a no-op"
from fastqdedup_tpu.pipeline import deduplicate_cluster
# In-process repeats: the first run backs the process's recycled buffer
# pools; later runs measure the steady state a long-lived service sees.
# Cross-process warming cannot do this on hosts with virtio free-page
# reporting (freed pages return to the hypervisor within seconds), and
# bench.py's official single-host number is measured the same way.
# Every host runs the same rep count (the pipeline is collective).
reps = int(os.environ.get("SCALE_INPROC_REPS", "3"))
import resource
for r in range(reps):
    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.time()
    deduplicate_cluster(inputs, [output], None, 1, 0.001)
    wall = time.time() - t0
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    # minflt counts fresh page mappings — the serialized resource on
    # hosts with hypervisor-backed lazy paging (bench_scaling README);
    # utime/stime expose CPU-vs-blocked time per rep.
    print("HOSTWALL", r, wall,
          "minflt", ru1.ru_minflt - ru0.ru_minflt,
          "majflt", ru1.ru_majflt - ru0.ru_majflt,
          "cpu", round(ru1.ru_utime - ru0.ru_utime
                       + ru1.ru_stime - ru0.ru_stime, 2),
          flush=True)
"""


def run_config(nproc: int, shard_files, workdir: str,
               repo: str) -> "tuple[float, list[str]]":
    """Launch ``nproc`` pinned processes; return (max wall, output files)."""
    port = str(_free_port())
    driver = os.path.join(workdir, "driver.py")
    with open(driver, "w") as f:
        f.write(_DRIVER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FASTQDEDUP_SHARDED_INPUT"] = "1"
    env.pop("XLA_FLAGS", None)
    # sitecustomize on this machine imports jax at startup, which would
    # initialize backends before jax.distributed.initialize (see
    # tests/test_distributed.py) — run with the repo only.
    env["PYTHONPATH"] = repo
    per_host = len(shard_files) // nproc
    procs = []
    outputs = []
    for p in range(nproc):
        mine = shard_files[p * per_host:(p + 1) * per_host]
        if len(mine) > 1:
            # BGZF byte-concatenation is valid BGZF: merge this host's
            # shards into one input file.
            merged = os.path.join(workdir, f"host{p}of{nproc}.fastq.gz")
            with open(merged, "wb") as out:
                for path in mine:
                    with open(path, "rb") as src:
                        out.write(src.read())
            mine = [merged]
        out_path = os.path.join(workdir, f"out{p}of{nproc}.fastq.gz")
        outputs.append(out_path)
        # SCALE_CORES_PER_HOST=c pins each host to c cores (default 1).
        # c=2 on this 4-core VM models 1->2 MULTI-CORE hosts: the C
        # kernels (hash, radix, verifiers, phred) take an nthreads
        # parameter and the per-host constant terms thread, which is the
        # regime real pod hosts run in.
        cores = int(os.environ.get("SCALE_CORES_PER_HOST", "1"))
        core_list = ",".join(str((p * cores + c) % os.cpu_count())
                             for c in range(cores))
        cmd = ["taskset", "-c", core_list, sys.executable, driver,
               str(nproc), str(p), port, ",".join(mine), out_path]
        procs.append(subprocess.Popen(cmd, env=env, cwd=workdir,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    rep_walls: dict = {}
    for p, proc in zip(range(nproc), procs):
        out = proc.communicate(timeout=3600)[0].decode("utf-8", "replace")
        if os.environ.get("SCALE_DEBUG") == "1":
            with open(os.path.join(workdir,
                                   f"log_{nproc}_{p}.txt"), "w") as f:
                f.write(out)
        if proc.returncode != 0:
            raise RuntimeError(f"host {p}/{nproc} failed:\n{out[-3000:]}")
        for ln in out.splitlines():
            if ln.startswith("HOSTWALL"):
                fields = ln.split()
                rep, wall = fields[1], fields[2]
                rep_walls.setdefault(int(rep), []).append(float(wall))
                if os.environ.get("SCALE_DEBUG") == "1":
                    print(f"  host {p}/{nproc} {ln}", file=sys.stderr)
    # A rep's wall is the SLOWEST host in that rep (collectives align
    # hosts within a rep); the config's time is the best steady-state
    # rep.  Taking each host's own best rep instead could pair walls
    # from different reps — a jointly unachievable time.
    return min(max(ws) for ws in rep_walls.values()), outputs


def main() -> None:
    n_reads = int(os.environ.get("SCALE_READS", 2_000_000))
    read_len = int(os.environ.get("SCALE_READ_LEN", 100))
    umi_len = int(os.environ.get("SCALE_UMI_LEN", 12))
    proc_counts = [int(p) for p in
                   os.environ.get("SCALE_PROCS", "1,2,4").split(",")]
    repo = os.path.dirname(os.path.abspath(__file__))
    workdir = tempfile.mkdtemp(prefix="fastqdedup_scale_")

    shards = []
    per_shard = n_reads // 4
    for s in range(4):
        path = os.path.join(workdir, f"shard{s}.fastq.gz")
        bench.generate_fastq(path, per_shard, read_len, umi_len,
                             seed=1000 + s)
        shards.append(path)
    print(f"generated 4x{per_shard} reads in {workdir}", file=sys.stderr)

    # No separate warmup runs: each config's in-process rep 0 (discarded
    # by the per-rep minimum) warms the compile cache and the buffer
    # pools under exactly the measured topology.

    # Best-of-N per config, with configs INTERLEAVED round-robin: this
    # VM's wall times swing ~2x with page-cache state and background
    # load over minutes, so running all of one config's repeats before
    # the next would compare different weather.  Interleaving puts every
    # config's k-th repeat in the same window; the per-config minimum is
    # the honest steady-state.
    repeats = int(os.environ.get("SCALE_REPEATS", 3))
    all_walls = {nproc: [] for nproc in proc_counts}
    reference_output = None
    for _ in range(repeats):
        for nproc in proc_counts:
            wall, outputs = run_config(nproc, shards, workdir, repo)
            all_walls[nproc].append(wall)
            merged = b"".join(gzip.open(o, "rb").read() for o in outputs)
            if reference_output is None:
                reference_output = merged
            elif merged != reference_output:
                raise AssertionError(
                    f"{nproc}-host output differs from 1-host output")
    results = {}
    for nproc in proc_counts:
        walls = all_walls[nproc]
        results[nproc] = min(walls)
        print(f"P={nproc}: {min(walls):.1f}s  "
              f"{n_reads / min(walls):,.0f} reads/s  "
              f"(runs: {', '.join(f'{w:.1f}' for w in walls)})",
              file=sys.stderr)

    base = min(p for p in results)
    t_base = results[base]
    for nproc in proc_counts:
        if nproc == base:
            continue
        eff = t_base * base / (nproc * results[nproc])
        print(f"scaling efficiency {base}->{nproc} hosts: {eff:.2f}",
              file=sys.stderr)
    if os.environ.get("SCALE_DEBUG") != "1":
        import shutil
        shutil.rmtree(workdir, ignore_errors=True)
    top = max(p for p in results)
    eff = t_base * base / (top * results[top])
    print(json.dumps({
        "metric": f"scaling_efficiency_{top}_hosts",
        "value": round(eff, 3),
        "unit": f"T({base})/({top}*T({top})) strong scaling, "
                f"{n_reads} reads, "
                f"{os.environ.get('SCALE_CORES_PER_HOST', '1')} core(s)/host",
        "vs_baseline": round(eff / 0.8, 3),
        "walls_s": {str(p): round(w, 1) for p, w in results.items()},
    }))


if __name__ == "__main__":
    main()

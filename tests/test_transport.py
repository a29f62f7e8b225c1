"""Direct tests for the TCP host-byte mesh (parallel/transport.py).

Meshes are wired up in-process over socketpairs — no jax.distributed
job needed — and collectives run concurrently on one thread per fake
process, exactly the call pattern the pipeline produces.
"""

import socket
import threading
from typing import List

import numpy as np
import pytest

from fastqdedup_tpu.parallel.transport import TcpMesh


def _make_meshes(nproc: int) -> List[TcpMesh]:
    socks = {}
    for a in range(nproc):
        for b in range(a + 1, nproc):
            sa, sb = socket.socketpair()
            socks[(a, b)] = sa
            socks[(b, a)] = sb
    return [TcpMesh(p, nproc,
                    {q: socks[(p, q)] for q in range(nproc) if q != p})
            for p in range(nproc)]


def _run_all(meshes, fn):
    """Run fn(mesh) concurrently on every mesh; return results in pid
    order, re-raising the first failure."""
    results = [None] * len(meshes)
    errors = []

    def work(i):
        try:
            results[i] = fn(meshes[i])
        except BaseException as exc:  # noqa: BLE001 - test harness
            errors.append(exc)

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(len(meshes))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    if errors:
        raise errors[0]
    return results


def test_allgather_blobs_orders_by_pid():
    meshes = _make_meshes(3)
    payloads = [b"alpha", b"", b"c" * 100_000]
    got = _run_all(meshes, lambda m: m.allgather_blobs(payloads[m.pid]))
    for per_pid in got:
        assert per_pid == payloads


def test_allgather_blobs_empty_is_barrier():
    meshes = _make_meshes(4)
    got = _run_all(meshes, lambda m: m.allgather_blobs(b""))
    assert all(r == [b""] * 4 for r in got)


def test_allgather_scatter_segments_and_padding():
    """Each host's stream scatters into per-host segment views; bytes
    between/after segments are discarded, and the local stream lands via
    memcpy (no wire)."""
    nproc = 3
    meshes = _make_meshes(nproc)
    rng = np.random.default_rng(7)
    streams = [rng.integers(0, 256, size=n, dtype=np.uint8)
               for n in (100, 0, 57)]

    def run(mesh):
        # Destination layout per source host: take [10:40) and [50:90)
        # of host 0's stream, nothing of host 1's, all of host 2's.
        d0a = np.zeros(30, dtype=np.uint8)
        d0b = np.zeros(40, dtype=np.uint8)
        d2 = np.zeros(57, dtype=np.uint8)
        dests = [[(d0a, 10), (d0b, 50)], [], [(d2, 0)]]
        mesh.allgather_scatter(streams[mesh.pid], dests)
        return d0a, d0b, d2

    for d0a, d0b, d2 in _run_all(meshes, run):
        assert d0a.tobytes() == streams[0][10:40].tobytes()
        assert d0b.tobytes() == streams[0][50:90].tobytes()
        assert d2.tobytes() == streams[2].tobytes()


def test_allgather_scatter_segment_larger_than_stream():
    """A destination view longer than the stream is filled only up to
    the stream's true size (the collective path pads; TCP does not)."""
    meshes = _make_meshes(2)
    streams = [np.arange(20, dtype=np.uint8), np.arange(5, dtype=np.uint8)]

    def run(mesh):
        d_all = [np.full(32, 0xEE, dtype=np.uint8) for _ in range(2)]
        mesh.allgather_scatter(streams[mesh.pid],
                               [[(d_all[0], 0)], [(d_all[1], 0)]])
        return d_all

    for d_all in _run_all(meshes, run):
        assert d_all[0][:20].tobytes() == streams[0].tobytes()
        assert (d_all[0][20:] == 0xEE).all()  # untouched past stream end
        assert d_all[1][:5].tobytes() == streams[1].tobytes()


def test_large_transfer_round_trip():
    """Multi-slice interleaved send path (> 4 MiB per stream)."""
    meshes = _make_meshes(2)
    rng = np.random.default_rng(3)
    streams = [rng.integers(0, 256, size=9 << 20, dtype=np.uint8)
               for _ in range(2)]

    def run(mesh):
        outs = [np.zeros(9 << 20, dtype=np.uint8) for _ in range(2)]
        mesh.allgather_scatter(streams[mesh.pid],
                               [[(outs[0], 0)], [(outs[1], 0)]])
        return outs

    for outs in _run_all(meshes, run):
        for h in range(2):
            assert (outs[h] == streams[h]).all()


def test_sequential_calls_tagged():
    """Back-to-back collectives stay in lockstep via call tags."""
    meshes = _make_meshes(2)

    def run(mesh):
        out = []
        for i in range(5):
            out.append(mesh.allgather_blobs(bytes([mesh.pid, i])))
        return out

    for per_pid in _run_all(meshes, run):
        for i, blobs in enumerate(per_pid):
            assert blobs == [bytes([0, i]), bytes([1, i])]


def test_close_wakes_blocked_peer():
    """close() on one side makes a peer blocked in a collective raise
    instead of hanging — the fail-fast contract abort_mesh relies on."""
    meshes = _make_meshes(2)
    failure = []

    def victim():
        try:
            meshes[0].allgather_blobs(b"x")
        except BaseException as exc:  # noqa: BLE001
            failure.append(exc)

    t = threading.Thread(target=victim)
    t.start()
    meshes[1].close()
    t.join(timeout=30)
    assert not t.is_alive(), "peer stayed blocked after close()"
    assert failure and isinstance(failure[0], (ConnectionError, OSError))


def test_get_mesh_single_process_is_none():
    import fastqdedup_tpu.parallel.transport as transport

    saved = (transport._mesh, transport._mesh_failed)
    transport._mesh, transport._mesh_failed = None, False
    try:
        assert transport.get_mesh() is None  # process_count() == 1 here
    finally:
        transport._mesh, transport._mesh_failed = saved


def test_abort_mesh_idempotent_without_mesh():
    from fastqdedup_tpu.parallel.transport import abort_mesh

    abort_mesh()
    abort_mesh()

"""Transparent (de)compressed file opening.

Stands in for the reference's ``xopen`` dependency
(/root/reference/src/fastqdedup/__init__.py:54-57, 197-198): files ending in
``.gz`` are opened through zlib-backed streams; everything else is plain
binary.  Output compression defaults to level 1 like the reference's
``xopen(..., compresslevel=1)``.  Writes produce BGZF (blocked gzip —
readable by every gzip tool, block-parallel to produce and to re-ingest)
with no mtime and fixed blocking, so outputs are deterministic
byte-for-byte across runs and across single-/multi-host execution.
"""

import gzip
import io
from typing import IO, Optional


def xopen(filename: str, mode: str = "rb", *,
          compresslevel: Optional[int] = 1,
          threads: int = 0) -> IO[bytes]:
    """Open ``filename`` for binary reading or writing, gunzipping or
    gzipping transparently when the name ends in ``.gz``.

    ``threads`` is accepted for xopen API compatibility and ignored (the
    reference itself always passes threads=0).
    """
    if "b" not in mode:
        mode += "b"
    is_gz = filename.endswith(".gz")
    if "r" in mode:
        if is_gz:
            return io.BufferedReader(
                gzip.open(filename, "rb"))  # type: ignore[arg-type]
        return open(filename, "rb", buffering=1024 * 1024)
    if "w" in mode or "a" in mode:
        if is_gz:
            if "a" not in mode:
                # Blocked gzip (BGZF), compressed on a thread pool: valid
                # input for any gzip reader, deterministic (fixed blocking,
                # no mtime), and block-parallel to both write here and
                # re-ingest later (the native parser inflates BGZF blocks
                # concurrently).  Matches how production genomics data is
                # stored (bgzip).
                from .bgzf import ParallelBgzfWriter
                return ParallelBgzfWriter(  # type: ignore[return-value]
                    filename, compresslevel or 1)
            raw = open(filename, mode)
            return gzip.GzipFile(filename="", mode=mode, fileobj=raw,
                                 compresslevel=compresslevel or 1,
                                 mtime=0)  # type: ignore[return-value]
        return open(filename, mode, buffering=1024 * 1024)
    raise ValueError(f"Unsupported mode: {mode}")

"""Transparent (de)compressed file opening.

Stands in for the reference's ``xopen`` dependency
(/root/reference/src/fastqdedup/__init__.py:54-57, 197-198): files ending in
``.gz`` are opened through zlib-backed streams; everything else is plain
binary.  Output compression defaults to level 1 like the reference's
``xopen(..., compresslevel=1)``, and gzip headers are written with mtime=0 so
outputs are deterministic byte-for-byte across runs.
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
                try:  # native zlib writer (byte-identical output, no GIL)
                    from ..native.loader import NativeGzWriter
                    return NativeGzWriter(  # type: ignore[return-value]
                        filename, compresslevel or 1)
                except (ImportError, OSError):
                    pass
            raw = open(filename, mode)
            return gzip.GzipFile(filename="", mode=mode, fileobj=raw,
                                 compresslevel=compresslevel or 1,
                                 mtime=0)  # type: ignore[return-value]
        return open(filename, mode, buffering=1024 * 1024)
    raise ValueError(f"Unsupported mode: {mode}")

"""ctypes bindings for the native FASTQ chunk parser / gzip writer.

Importing this module builds (if needed) and loads ``_fastq_io.so``.  On any
failure an ImportError propagates and callers fall back to the pure-Python
path (fastqdedup_tpu/io/fastq.py).
"""

import ctypes
import os
from typing import Iterator

import numpy as np

from .build import library_path

_FQ_OK = 0
_FQ_ERR_FORMAT = 3

_lib = ctypes.CDLL(library_path())

_lib.fq_open.restype = ctypes.c_void_p
_lib.fq_open.argtypes = [ctypes.c_char_p]
_lib.fq_close.restype = None
_lib.fq_close.argtypes = [ctypes.c_void_p]
_lib.fq_error.restype = ctypes.c_char_p
_lib.fq_error.argtypes = [ctypes.c_void_p]
_lib.fq_error_line.restype = ctypes.c_int64
_lib.fq_error_line.argtypes = [ctypes.c_void_p]
_lib.fq_has_pending.restype = ctypes.c_int
_lib.fq_has_pending.argtypes = [ctypes.c_void_p]
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_lib.fq_next_chunk.restype = ctypes.c_int
_lib.fq_next_chunk.argtypes = [
    ctypes.c_void_p, ctypes.c_int64,
    _u8p, _u8p, ctypes.c_int64, _i64p,
    _u8p, ctypes.c_int64, _i64p,
    ctypes.POINTER(ctypes.c_int64)]

_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_lib.fq_avg_error_rates.restype = ctypes.c_int64
_lib.fq_avg_error_rates.argtypes = [
    _u8p, _i64p, ctypes.c_int64, ctypes.c_int, _f64p]

_lib.fqw_open.restype = ctypes.c_void_p
_lib.fqw_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
_lib.fqw_write.restype = ctypes.c_int
_lib.fqw_write.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int64]
_lib.fqw_close.restype = ctypes.c_int
_lib.fqw_close.argtypes = [ctypes.c_void_p]

# Initial per-record payload estimate; buffers regrow on overflow carry.
_BYTES_PER_RECORD = 256
_HEAD_BYTES_PER_RECORD = 96


def read_fastq_chunks_native(filename: str, chunk_records: int = 1 << 18
                             ) -> Iterator["FastqChunk"]:
    """Yield columnar FastqChunk batches parsed by the C library."""
    from ..io.fastq import FastqChunk, FastqFormatError

    handle = _lib.fq_open(os.fsencode(filename))
    if not handle:
        raise OSError(f"could not open {filename!r}")
    payload_cap = chunk_records * _BYTES_PER_RECORD
    head_cap = chunk_records * _HEAD_BYTES_PER_RECORD
    try:
        while True:
            seq_buf = np.empty(payload_cap, dtype=np.uint8)
            qual_buf = np.empty(payload_cap, dtype=np.uint8)
            head_buf = np.empty(head_cap, dtype=np.uint8)
            offsets = np.empty(chunk_records + 1, dtype=np.int64)
            head_offsets = np.empty(chunk_records + 1, dtype=np.int64)
            n_records = ctypes.c_int64(0)
            rc = _lib.fq_next_chunk(
                handle, chunk_records, seq_buf, qual_buf, payload_cap,
                offsets, head_buf, head_cap, head_offsets,
                ctypes.byref(n_records))
            if rc != _FQ_OK:
                message = _lib.fq_error(handle).decode(
                    "utf-8", "replace") or f"native parser error {rc}"
                line = _lib.fq_error_line(handle)
                if rc == _FQ_ERR_FORMAT:
                    raise FastqFormatError(
                        f"{filename}: {message}",
                        line=int(line) if line >= 0 else None)
                raise OSError(f"{filename}: {message}")
            n = n_records.value
            if n == 0:
                if _lib.fq_has_pending(handle):
                    # A single record exceeds the buffers: grow and retry.
                    payload_cap *= 2
                    head_cap *= 2
                    continue
                return
            yield FastqChunk(
                sequences=seq_buf[:offsets[n]],
                qualities=qual_buf[:offsets[n]],
                offsets=offsets[:n + 1],
                headers=head_buf[:head_offsets[n]],
                header_offsets=head_offsets[:n + 1],
            )
            if n < chunk_records:
                # Buffers filled before the record quota: records are larger
                # than estimated; grow the payload estimate for next chunks.
                payload_cap *= 2
                head_cap *= 2
    finally:
        _lib.fq_close(handle)


def average_error_rates_native(qual_data: np.ndarray,
                               offsets: np.ndarray,
                               phred_offset: int = 33) -> np.ndarray:
    """float64 [N] mean error rate per ragged record (C hot loop).

    Bit-identical to the reference's sequential accumulation
    (_fastqmodule.c:58-75).  Raises ValueError on out-of-range phred bytes.
    """
    n = len(offsets) - 1
    out = np.empty(n, dtype=np.float64)
    qual_data = np.ascontiguousarray(qual_data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    bad = _lib.fq_avg_error_rates(qual_data, offsets, n,
                                  int(phred_offset), out)
    if bad >= 0:
        char = int(qual_data[bad])
        raise ValueError(
            f"Character {chr(char)} outside of valid phred range "
            f"('{chr(phred_offset)}' to '{chr(126)}')")
    return out


class NativeGzWriter:
    """zlib-backed block writer (transparent for .gz and plain paths)."""

    def __init__(self, filename: str, compresslevel: int = 1):
        self._handle = _lib.fqw_open(os.fsencode(filename),
                                     int(compresslevel))
        if not self._handle:
            raise OSError(f"could not open {filename!r} for writing")

    def write(self, data) -> int:
        arr = np.frombuffer(data, dtype=np.uint8) \
            if not isinstance(data, np.ndarray) else data
        if len(arr) and _lib.fqw_write(self._handle, arr,
                                       len(arr)) != _FQ_OK:
            raise OSError("native gzip write failed")
        return len(arr)

    def close(self) -> None:
        if self._handle:
            rc = _lib.fqw_close(self._handle)
            self._handle = None
            if rc != _FQ_OK:
                raise OSError("native gzip close failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""ctypes bindings for the native FASTQ batch reader (fastq_reader.cpp).

Builds libmfxnative.so on first use via the in-tree Makefile (no pybind11
in the image; plain C ABI + ctypes). ``available()`` gates all use; the
Python parser in io/fastq.py is the drop-in fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmfxnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        srcs = [os.path.join(_DIR, f)
                for f in ("fastq_reader.cpp", "dedup.cpp", "merge.cpp",
                          "graph.cpp")]
        if not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(s) for s in srcs
        ):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.mfx_fastq_open.restype = ctypes.c_void_p
        lib.mfx_fastq_open.argtypes = [ctypes.c_char_p]
        lib.mfx_fastq_next_batch.restype = ctypes.c_long
        lib.mfx_fastq_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ]
        lib.mfx_fastq_bases_read.restype = ctypes.c_long
        lib.mfx_fastq_bases_read.argtypes = [ctypes.c_void_p]
        lib.mfx_fastq_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_batches(
    path: str, batch_reads: int, max_read_len: int, limit_bases: int = 0
) -> Iterator:
    """Yield ReadBatch objects (same contract as io/fastq.read_batches with
    keep_names=False)."""
    from ..io.fastq import ReadBatch

    lib = _load()
    assert lib is not None
    handle = lib.mfx_fastq_open(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        while True:
            seqs = np.full((batch_reads, max_read_len), 4, dtype=np.int8)
            quals = np.zeros((batch_reads, max_read_len), dtype=np.int8)
            lens = np.zeros(batch_reads, dtype=np.int32)
            n = lib.mfx_fastq_next_batch(
                handle,
                seqs.ctypes.data_as(ctypes.c_void_p),
                quals.ctypes.data_as(ctypes.c_void_p),
                lens.ctypes.data_as(ctypes.c_void_p),
                batch_reads, max_read_len, limit_bases,
            )
            if n <= 0:
                return
            yield ReadBatch(seqs, quals, lens, int(n), None)
            if n < batch_reads:
                return
    finally:
        lib.mfx_fastq_close(handle)

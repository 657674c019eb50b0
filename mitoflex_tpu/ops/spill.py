"""Range-partitioned disk spill for sorted (k-mer key, count) runs.

The host side of the k-mer LSM at beyond-RAM scale (the megahit/KMC
discipline — the reference's megahit core counts 5 Gbp inputs in 5-20 GB
by partitioning k-mer buckets to disk, /root/reference/README.md:19):
each sorted run that would otherwise accumulate in host memory is sliced
into ``n_buckets`` contiguous key ranges (uniform on the leading key word;
both strands are counted so keys are near-uniform) and appended to one
file per bucket. Merging then proceeds bucket by bucket: peak host memory
is O(bucket) + the caller's accumulated output (the gated solid table),
never O(distinct k-mers).

File format per bucket: repeated records of
``uint64 n | n*W uint32 keys (C order) | n uint64 counts``.
Each record is an ascending sorted run; records merge pairwise with the
native O(n) merge at read time.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
from typing import List, Optional, Tuple

import numpy as np


class BucketSpill:
    def __init__(self, W: int, n_buckets: int = 64,
                 base_dir: Optional[str] = None):
        self.W = W
        self.n_buckets = n_buckets
        self.dir = tempfile.mkdtemp(prefix="kmer_spill_", dir=base_dir)
        # inner bucket boundaries on the leading key word: bucket b holds
        # keys with word0 in [b*2^32/B, (b+1)*2^32/B)
        self.inner = np.asarray(
            [(b * (1 << 32)) // n_buckets for b in range(1, n_buckets)],
            np.uint32,
        )
        self.rows = 0

    def _path(self, b: int) -> str:
        return os.path.join(self.dir, f"bucket_{b:04d}.bin")

    def append(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Append one ascending sorted run, sliced into bucket ranges."""
        if len(keys) == 0:
            return
        cuts = np.concatenate(
            [[0], np.searchsorted(keys[:, 0], self.inner), [len(keys)]]
        )
        c64 = np.ascontiguousarray(counts.astype(np.uint64))
        k32 = np.ascontiguousarray(keys.astype(np.uint32))
        for b in range(self.n_buckets):
            s, e = int(cuts[b]), int(cuts[b + 1])
            if e <= s:
                continue
            with open(self._path(b), "ab") as f:
                f.write(struct.pack("<Q", e - s))
                f.write(k32[s:e].tobytes())
                f.write(c64[s:e].tobytes())
        self.rows += len(keys)

    def read_bucket(self, b: int) -> List[Tuple[np.ndarray, np.ndarray]]:
        """All sorted runs appended to bucket b."""
        path = self._path(b)
        if not os.path.exists(path):
            return []
        out = []
        with open(path, "rb") as f:
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                (n,) = struct.unpack("<Q", hdr)
                keys = np.frombuffer(f.read(n * self.W * 4), np.uint32)
                keys = keys.reshape(n, self.W)
                counts = np.frombuffer(f.read(n * 8), np.uint64)
                out.append((keys, counts))
        return out

    def cleanup(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    def __del__(self):  # best-effort temp cleanup
        try:
            self.cleanup()
        except Exception:
            pass

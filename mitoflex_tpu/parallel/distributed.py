"""Multi-host initialization and sharded ingestion helpers.

The reference is strictly single-node; this engine scales across hosts
with ``jax.distributed`` + a global data mesh. Per-host work division is
deterministic file-range splitting: each host reads its slice of the FASTQ
byte range (records re-aligned at the next '@' header), so ingestion needs
no coordination; k-mer histograms and hit tables merge through the global
mesh's collectives (parallel/mesh.py).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from ..utils.logger import logger


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod runtime's automatic values). Returns (process_id, n_processes);
    (0, 1) when single-process."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    pid = jax.process_index()
    n = jax.process_count()
    logger.info(f"distributed: process {pid}/{n} via {coordinator}")
    return pid, n


def _align_to_record(f, raw: int, size: int) -> int:
    """First byte at/after ``raw`` that starts a FASTQ record: an '@' line
    whose line+2 is the '+' separator (quality lines may also start with
    '@', so the shape check is required)."""
    if raw <= 0:
        return 0
    if raw >= size:
        return size
    f.seek(raw)
    f.readline()  # skip the partial line
    while True:
        pos = f.tell()
        line = f.readline()
        if not line:
            return size
        if line.startswith(b"@"):
            f.readline()
            sep = f.readline()
            f.seek(pos)
            if sep.startswith(b"+"):
                return pos
            f.readline()


def host_file_range(path: str, process_id: int, n_processes: int) -> Tuple[int, int]:
    """Deterministic per-host byte range of a FASTQ file: the raw equal
    shares are aligned forward to record starts, and each host's end IS the
    next host's aligned start — contiguous, non-overlapping, covering."""
    size = os.path.getsize(path)
    share = size // n_processes
    with open(path, "rb") as f:
        start = _align_to_record(f, share * process_id, size)
        end = size if process_id == n_processes - 1 else _align_to_record(
            f, share * (process_id + 1), size
        )
    return start, end

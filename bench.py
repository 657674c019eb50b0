"""Benchmark harness — prints ONE JSON line for the driver.

Metric: read-filter device throughput in bases/second on one chip (the
BASELINE "filter-only" config; the reference filters 5 Gbp in ~5 minutes
on 8 CPU threads — configurations.py:45-48 notes the 5-minute plain-output
filter stage — i.e. ~16.7 Mbp/s; vs_baseline is measured against that).

Runs on whatever backend JAX resolves (the driver provides the real TPU
chip); excludes compile time via warmup and amortizes dispatch over a
block of batches.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_BASES_PER_SEC = 5e9 / 300.0  # reference: 5 Gbp / ~5 min, 8 threads


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from mitoflex_tpu.ops import filter as filter_ops

    backend = jax.default_backend()
    B, L = 65536, 256
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 5, size=(B, L)).astype(np.int8)
    quals = rng.integers(35, 74, size=(B, L)).astype(np.int8)
    lengths = rng.integers(200, L + 1, size=B).astype(np.int32)
    ds, dq, dl = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)

    if backend == "tpu":
        run = lambda: filter_ops.filter_reads_pallas(ds, dq, dl, 10, 55, 0.2)
    else:
        run = lambda: filter_ops.filter_reads_ref(ds, dq, dl, 10, 55, 0.2)

    # warmup / compile
    for _ in range(3):
        jax.block_until_ready(run())
    # timed
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    bases_per_sec = B * L / dt

    print(json.dumps({
        "metric": "filter_device_throughput",
        "value": round(bases_per_sec / 1e9, 4),
        "unit": "Gbase/s/chip",
        "vs_baseline": round(bases_per_sec / BASELINE_BASES_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

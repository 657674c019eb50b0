"""Benchmark harness — prints ONE JSON line for the driver.

Metric: read-filter device throughput in bases/second on one chip (the
BASELINE "filter-only" config; the reference filters 5 Gbp in ~5 minutes
on 8 CPU threads — configurations.py:45-48 — i.e. ~16.7 Mbp/s;
vs_baseline is measured against that).

Measurement method: the kernel runs inside a device-side fori_loop with a
per-iteration input perturbation (xor with the loop counter) and the loop
result is reduced to one scalar that is read back to the host. This makes
the timing robust against async dispatch, remote-execution result caching,
and loop-invariant hoisting — the wall clock covers exactly `iters` real
kernel executions plus one dispatch+readback.
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
    seqs = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    quals = rng.integers(35, 74, size=(B, L)).astype(np.int8)
    lengths = rng.integers(200, L + 1, size=B).astype(np.int32)
    ds, dq, dl = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)

    use_pallas = backend == "tpu"
    if use_pallas:
        # probe the Mosaic compile service in a throwaway subprocess: a
        # wedged helper hangs compiles indefinitely and would hang the
        # bench; fall back to the (bit-identical) XLA kernel in that case
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c", (
                    "import jax, jax.numpy as jnp\n"
                    "from jax.experimental import pallas as pl\n"
                    "from jax.experimental.pallas import tpu as pltpu\n"
                    "def k(x, o):\n    o[:] = x[:] * 2\n"
                    "out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),\n"
                    "  in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],\n"
                    "  out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(jnp.ones((8,128)))\n"
                    "print(float(out.sum()))\n"
                )],
                capture_output=True, timeout=240,
            )
            use_pallas = probe.returncode == 0
        except Exception:
            use_pallas = False
        if not use_pallas:
            print("# pallas probe failed; using the XLA filter kernel", file=sys.stderr)
    kernel = filter_ops.filter_reads_pallas if use_pallas else filter_ops.filter_reads_ref

    def loop(iters):
        @jax.jit
        def run(s, q, l, seed):
            def body(i, acc):
                # perturb the input per iteration AND per invocation (seed):
                # the remote platform caches results per (executable, inputs)
                s2 = s ^ ((i + seed) & 3).astype(jnp.int8)
                keep, h1, _ = kernel(s2, q, l, 10, 55, 0.2)
                return acc + jnp.sum(keep.astype(jnp.int32)) + h1[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        return run

    run_1 = loop(1)
    iters = 50
    run_n = loop(iters)
    seed = [100]

    def call(fn):
        seed[0] += 1
        return int(fn(ds, dq, dl, np.int32(seed[0])))

    # warmup / compile
    call(run_1)
    call(run_n)
    # calibrate: measure 1 vs N to subtract dispatch+readback overhead
    t0 = time.perf_counter()
    call(run_1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    call(run_n)
    t_n = time.perf_counter() - t0
    per_iter = max((t_n - t_one) / (iters - 1), 1e-9)
    bases_per_sec = B * L / per_iter

    print(json.dumps({
        "metric": "filter_device_throughput",
        "value": round(bases_per_sec / 1e9, 4),
        "unit": "Gbase/s/chip",
        "vs_baseline": round(bases_per_sec / BASELINE_BASES_PER_SEC, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

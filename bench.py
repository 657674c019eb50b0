"""Benchmark harness — prints ONE JSON line for the driver.

Metric: read-filter device throughput in bases/second on one chip (the
BASELINE "filter-only" config; the reference filters 5 Gbp in ~5 minutes
on 8 CPU threads — configurations.py:45-48 — i.e. ~16.7 Mbp/s;
vs_baseline is measured against that).

Structure: the parent process never imports jax. It launches timeboxed
child processes (this same file with ``--child``) that claim the device
session, measure, and print the JSON line; the parent relays the last
JSON line it sees. The measured kernel is the framework's default filter
dispatch (plain XLA — measured FASTER than the hand-written Pallas kernel,
see ops/filter.py; set MITOFLEX_FORCE_PALLAS=1 to measure that one
instead). If an attempt wedges (the remote compile tunnel serves one
session at a time and can hang), the child is killed, the tunnel gets a
cooldown, and the attempt is retried; a CPU child is the last resort.

Measurement method (in the child): the kernel runs inside a device-side
fori_loop with a per-iteration AND per-invocation input perturbation, and
the loop result is reduced to one scalar read back to the host. This is
robust against async dispatch, remote result caching, and loop-invariant
hoisting — the wall clock covers exactly `iters` real kernel executions
plus one dispatch+readback. Per-iteration time is the median over
repeated (1-iter, N-iter) timing pairs to reject tunnel RTT variance.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_BASES_PER_SEC = 5e9 / 300.0  # reference: 5 Gbp / ~5 min, 8 threads
CHILD_TIMEOUT_S = int(os.environ.get("MITOFLEX_BENCH_TIMEOUT", "900"))
COOLDOWN_S = 75  # tunnel session release after killing a wedged child


def _child() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mitoflex_tpu.ops import filter as filter_ops

    backend = jax.default_backend()
    B, L = 65536, 256
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    quals = rng.integers(35, 74, size=(B, L)).astype(np.int8)
    lengths = rng.integers(200, L + 1, size=B).astype(np.int32)
    ds, dq, dl = jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)

    use_pallas = (
        backend == "tpu" and os.environ.get("MITOFLEX_FORCE_PALLAS") == "1"
        and os.environ.get("MITOFLEX_DISABLE_PALLAS") != "1"
    )
    kernel = (
        filter_ops.filter_reads_pallas if use_pallas else filter_ops.filter_reads_ref
    )
    print(f"# child: backend={backend} pallas={use_pallas}", file=sys.stderr)

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
    iters = 400  # large enough that the loop dwarfs dispatch RTT variance
    run_n = loop(iters)
    seed = [100]

    def call(fn):
        seed[0] += 1
        return int(fn(ds, dq, dl, np.int32(seed[0])))

    call(run_1)  # warmup / compile
    print("# child: 1-iter compiled", file=sys.stderr)
    call(run_n)
    print("# child: N-iter compiled", file=sys.stderr)
    pairs = []
    for _ in range(3):
        t0 = time.perf_counter()
        call(run_1)
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        call(run_n)
        t_n = time.perf_counter() - t0
        pairs.append(max((t_n - t_one) / (iters - 1), 1e-9))
    per_iter = float(np.median(pairs))
    bases_per_sec = B * L / per_iter

    print(json.dumps({
        "metric": "filter_device_throughput",
        "value": round(bases_per_sec / 1e9, 4),
        "unit": "Gbase/s/chip",
        "vs_baseline": round(bases_per_sec / BASELINE_BASES_PER_SEC, 2),
    }))
    return 0


def _run_child(extra_env: dict) -> str | None:
    """Run one measurement child; return its JSON line or None."""
    env = dict(os.environ, **extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=CHILD_TIMEOUT_S, env=env,
        )
    except subprocess.TimeoutExpired:
        print("# bench child timed out", file=sys.stderr)
        return None
    for line in proc.stderr.splitlines():
        print(line, file=sys.stderr)
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return line
    return None


def main() -> int:
    if "--child" in sys.argv:
        return _child()

    line = _run_child({})
    if line is None:
        print(f"# retrying after {COOLDOWN_S}s tunnel cooldown", file=sys.stderr)
        time.sleep(COOLDOWN_S)
        line = _run_child({"MITOFLEX_DISABLE_PALLAS": "1",
                           "MITOFLEX_FORCE_PALLAS": "0"})
    if line is None:
        print("# all device attempts failed; reporting CPU-backend number",
              file=sys.stderr)
        time.sleep(COOLDOWN_S)
        line = _run_child({"JAX_PLATFORMS": "cpu",
                           "MITOFLEX_DISABLE_PALLAS": "1"})
    if line is None:
        return 1
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Mesh scaling benchmark: the fused pipeline step at 1/2/4/8 devices.

Measures WEAK scaling (fixed per-device batch) of parallel/mesh.py
``pipeline_step`` — filter -> distributed k-mer histogram merge ->
profile-HMM scan — and prints throughput + scaling efficiency per mesh
size. On a real multi-chip slice this is the end-to-end scale-out
number (collectives over ICI); on a single host it runs the identical
program on a virtual CPU mesh (--cpu), which validates the sharding and
measures host-parallel scaling only.

    python scripts/scalebench.py [--cpu] [--devices 1,2,4,8]
                                 [--reads-per-device 4096] [--len 128]

Timing uses the honest repeated-pair method (see bench.py): dispatch +
readback of a scalar from the full sharded step, per-invocation input
perturbation so no layer can serve cached results.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force a virtual CPU mesh (8 host devices)")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--reads-per-device", type=int, default=4096)
    ap.add_argument("--len", type=int, dest="read_len", default=128)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the sandbox pre-imports jax; env alone is too late — honor an
        # ambient JAX_PLATFORMS=cpu the same as --cpu
        jax.config.update("jax_platforms", "cpu")

    from mitoflex_tpu.models import hmm as hmm_models
    from mitoflex_tpu.ops import phmm as phmm_ops
    from mitoflex_tpu.parallel import mesh as mesh_mod

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")

    rng = np.random.default_rng(0)
    cons = "".join("ACGT"[i] for i in rng.integers(0, 4, 96))
    prof = phmm_ops.stage_profile(
        hmm_models.profile_from_consensus("SCALE", cons), pad_to=128
    )

    sizes = [int(x) for x in args.devices.split(",")]
    sizes = [n for n in sizes if n <= len(jax.devices())]
    base_tp = None
    for n in sizes:
        m = mesh_mod.make_mesh((n,), ("data",))
        B = args.reads_per_device * n
        seqs = rng.integers(0, 4, size=(B, args.read_len)).astype(np.int8)
        quals = rng.integers(60, 74, size=(B, args.read_len)).astype(np.int8)
        lengths = np.full(B, args.read_len, np.int32)
        ds, dq, dl = mesh_mod.shard_batch(
            m, jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths)
        )

        def step(seed):
            out = mesh_mod.pipeline_step(
                m, ds ^ jnp.int8(seed & 3), dq, dl, prof, 96, k=args.k
            )
            return int(out["kept"]) + int(out["n_unique_kmers"])

        step(0)  # compile all three sharded programs
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            step(r + 1)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        tp = B * args.read_len / dt
        if base_tp is None:
            base_tp = tp / n
        eff = tp / (base_tp * n)
        print(
            f"mesh={n}: {dt*1e3:8.1f} ms/step  {tp/1e6:9.2f} Mbase/s  "
            f"weak-scaling eff {eff*100:5.1f}%"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""At-scale graph-pass soak (round-4 VERDICT missing #1 / directive #1):
build a >=100M-edge both-strand solid table from a synthetic genome and
run the PRODUCTION graph path — native pass + native unitig assembly +
the assemble_k clean fixpoint — with walls and peak RSS measured, not
projected.

The fixture is a single long random genome (plus optional error reads'
worth of branch noise via a second shorter genome sharing no sequence):
a contiguous genome of N bases yields ~2N both-strand edges forming long
chains — the structure the kmin pass sees after the depth gate, at
whatever N the ``MITOFLEX_GRAPH_MBP`` knob selects (default 50 -> ~100M
edges).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from mitoflex_tpu.native import graph_native
    from mitoflex_tpu.ops import dbg as dbg_ops
    from mitoflex_tpu.ops import kmer as kmer_ops
    from mitoflex_tpu.stages import assemble as asm
    from mitoflex_tpu.stages import graph_clean

    mbp = float(os.environ.get("MITOFLEX_GRAPH_MBP", "50"))
    k = int(os.environ.get("MITOFLEX_GRAPH_K", "21"))
    rng = np.random.default_rng(9)
    N = int(mbp * 1e6)
    g = rng.integers(0, 4, N).astype(np.int8)

    # edge table straight from the rolling counter (the gate's output
    # shape): count in row slices, merge, expand to both strands
    t0 = time.perf_counter()
    row_len, kp1 = 4096, k + 1
    step = row_len - kp1 + 1
    counter = asm.KmerCounter(kp1, canonical=True)
    chunk = 4096
    starts = np.arange(0, N - kp1 + 1, step)
    for lo in range(0, len(starts), chunk):
        sel = starts[lo : lo + chunk]
        mat = np.zeros((len(sel), row_len), np.int8)
        lens = np.zeros(len(sel), np.int32)
        for i, s in enumerate(sel):
            piece = g[s : s + row_len]
            mat[i, : len(piece)] = piece
            lens[i] = len(piece)
        counter.add_chunk(mat, lens)
    t_count = time.perf_counter() - t0
    t0 = time.perf_counter()
    sk, sc = [], []
    for keys, counts in counter.merged_iter():
        sk.append(keys)
        sc.append(counts)
    keys, counts = kmer_ops.expand_canonical(
        np.concatenate(sk), np.concatenate(sc), kp1
    )
    t_gate = time.perf_counter() - t0
    E = len(keys)
    print(f"# graphbench: {E/1e6:.1f}M edges from {mbp} Mbp "
          f"(count {t_count:.1f}s, expand {t_gate:.1f}s) rss {_rss_gb():.2f}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    gp = dbg_ops.graph_unitig_pass_host(keys, counts, k)
    t_pass = time.perf_counter() - t0
    t0 = time.perf_counter()
    uset = dbg_ops.unitig_set_from_pass(gp, k)
    t_unitig = time.perf_counter() - t0
    print(f"# graphbench: pass {t_pass:.1f}s unitig {t_unitig:.1f}s "
          f"(V={int(gp.n_nodes)/1e6:.1f}M u={uset.n}) rss {_rss_gb():.2f}",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    clean = graph_clean.CleanParams(prune_depth=0, prune_level=2,
                                    bubble_level=2)
    contigs, _ = asm.assemble_k(keys, counts, k, clean, min_standalone=200,
                                max_clean_rounds=3)
    t_fixpoint = time.perf_counter() - t0

    print(json.dumps({
        "graph_edges_m": round(E / 1e6, 1),
        "graph_nodes_m": round(int(gp.n_nodes) / 1e6, 1),
        "graph_count_wall_s": round(t_count, 1),
        "graph_pass_wall_s": round(t_pass, 1),
        "graph_unitig_wall_s": round(t_unitig, 1),
        "graph_fixpoint_wall_s": round(t_fixpoint, 1),
        "graph_contigs": len(contigs),
        "graph_peak_rss_gb": round(_rss_gb(), 2),
        "graph_native": graph_native._lib() is not None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

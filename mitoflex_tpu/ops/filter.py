"""Read quality-filter kernel.

TPU-native replacement of the reference's Rust stream filter
(filter/filter_bin/src/main.rs:188-323): per read, over the valid length —

- count Ns (code 4); drop the read if the count exceeds ``ns_valve``;
- count "bad" bases whose raw phred+33 byte is <= ``quality_valve``;
  drop if bad_count >= floor(f32(cutoff_len) * f32(percentage_valve)) —
  the float32 truncation mirrors the reference's `(len as f32 * limit) as
  usize` exactly, and ``cutoff_len`` is read 1's length for BOTH mates of
  a pair (main.rs:236-241 computes one cutoff from seq1);
- emit a 64-bit rolling hash of the base codes (two independent 32-bit
  polynomial hashes) used for optional PE deduplication
  (main.rs:325 ``calculate_hash``).

The decision is a pure per-row reduction over a [reads, max_len] tile, so it
runs on the VPU with one HBM pass. Implemented as a Pallas kernel gridded
over read blocks, with a jnp reference implementation used for CPU tests and
parity checks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CODE = 4
# polynomial hash bases (odd => invertible mod 2^32, good mixing)
_HASH_B1 = np.uint32(0x01000193)  # FNV prime
_HASH_B2 = np.uint32(0x85EBCA6B)  # murmur3 c2


def _hash_powers(max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    p1 = np.empty(max_len, dtype=np.uint32)
    p2 = np.empty(max_len, dtype=np.uint32)
    a1 = np.uint32(1)
    a2 = np.uint32(1)
    with np.errstate(over="ignore"):
        for i in range(max_len):
            p1[i] = a1
            p2[i] = a2
            a1 = np.uint32(a1 * _HASH_B1)
            a2 = np.uint32(a2 * _HASH_B2)
    return p1, p2


def quality_cutoffs(cutoff_lengths: jax.Array, percentage_valve: float) -> jax.Array:
    """floor(f32(len) * f32(limit)) as int — the exact bad-base cutoff the
    reference computes (main.rs:236 `(seq1.len() as f32 * limit) as usize`).
    A read is dropped when bad_count >= cutoff; cutoff 0 drops everything
    (including empty reads)."""
    return jnp.floor(
        cutoff_lengths.astype(jnp.float32) * jnp.float32(percentage_valve)
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ns_valve", "quality_valve", "percentage_valve"))
def filter_reads_ref(
    seqs: jax.Array,      # [B, L] int8 base codes
    quals: jax.Array,     # [B, L] int8 raw phred+33 bytes
    lengths: jax.Array,   # [B] int32
    ns_valve: int,
    quality_valve: int,
    percentage_valve: float,
    cutoff_lengths: jax.Array | None = None,  # [B] int32; PE passes mate 1's
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """jnp reference: returns (keep [B] bool, hash1 [B] uint32, hash2 [B] uint32)."""
    B, L = seqs.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    valid = col < lengths[:, None]
    n_count = jnp.sum(jnp.logical_and(seqs == N_CODE, valid), axis=1)
    bad = jnp.sum(
        jnp.logical_and(quals.astype(jnp.int32) <= quality_valve, valid), axis=1
    )
    cutoff = quality_cutoffs(
        lengths if cutoff_lengths is None else cutoff_lengths, percentage_valve
    )
    keep = jnp.logical_and(n_count <= ns_valve, bad < cutoff)
    p1, p2 = _hash_powers(L)
    s = jnp.where(valid, seqs.astype(jnp.uint32) + 1, 0)
    h1 = jnp.sum(s * jnp.asarray(p1)[None, :], axis=1, dtype=jnp.uint32)
    h2 = jnp.sum(s * jnp.asarray(p2)[None, :], axis=1, dtype=jnp.uint32)
    return keep, h1, h2


def _filter_kernel(params_ref, seqs_ref, quals_ref, len_ref, cutoff_ref,
                   p1_ref, p2_ref, keep_ref, h1_ref, h2_ref):
    ns_valve = params_ref[0]
    quality_valve = params_ref[1]

    seqs = seqs_ref[:].astype(jnp.int32)   # [RB, L]
    quals = quals_ref[:].astype(jnp.int32)
    lengths = len_ref[:]                   # [RB, 1] int32
    cutoffs = cutoff_ref[:]                # [RB, 1] int32 (quality_cutoffs)
    RB, L = seqs.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (RB, L), 1)
    lenb = jnp.broadcast_to(lengths, (RB, L))
    # int32 indicator arithmetic throughout: Mosaic mishandles relayouts of
    # broadcast i1 vectors and lacks unsigned reductions.
    valid = (col < lenb).astype(jnp.int32)
    n_count = jnp.sum((seqs == N_CODE).astype(jnp.int32) * valid, axis=1, keepdims=True)
    bad = jnp.sum((quals <= quality_valve).astype(jnp.int32) * valid, axis=1, keepdims=True)
    keep = (
        (n_count <= ns_valve).astype(jnp.int32)
        * (bad < cutoffs).astype(jnp.int32)
    )
    keep_ref[:] = keep

    # int32 wrapping arithmetic == uint32 bit pattern; bitcast outside.
    s = (seqs + 1) * valid
    h1_ref[:] = jnp.sum(s * p1_ref[:], axis=1, keepdims=True, dtype=jnp.int32)
    h2_ref[:] = jnp.sum(s * p2_ref[:], axis=1, keepdims=True, dtype=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("ns_valve", "quality_valve", "percentage_valve", "block_reads", "interpret"),
)
def filter_reads_pallas(
    seqs: jax.Array,
    quals: jax.Array,
    lengths: jax.Array,
    ns_valve: int,
    quality_valve: int,
    percentage_valve: float,
    cutoff_lengths: jax.Array | None = None,
    block_reads: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    B, L = seqs.shape
    block_reads = min(block_reads, B)
    assert B % block_reads == 0, (B, block_reads)
    grid = (B // block_reads,)
    params = jnp.array([ns_valve, quality_valve], dtype=jnp.int32)
    cutoffs = quality_cutoffs(
        jnp.asarray(lengths if cutoff_lengths is None else cutoff_lengths),
        percentage_valve,
    )
    p1, p2 = _hash_powers(L)
    keep, h1, h2 = pl.pallas_call(
        _filter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_reads, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_reads, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_reads, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(params, seqs, quals, lengths.reshape(B, 1).astype(jnp.int32),
      cutoffs.reshape(B, 1),
      jnp.asarray(p1.view(np.int32)).reshape(1, L),
      jnp.asarray(p2.view(np.int32)).reshape(1, L))
    return (
        keep[:, 0] != 0,
        jax.lax.bitcast_convert_type(h1[:, 0], jnp.uint32),
        jax.lax.bitcast_convert_type(h2[:, 0], jnp.uint32),
    )


def filter_reads(
    seqs,
    quals,
    lengths,
    ns_valve: int,
    quality_valve: int,
    percentage_valve: float,
    cutoff_lengths=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dispatch: XLA everywhere by default; MITOFLEX_FORCE_PALLAS=1 selects
    the hand-written Pallas kernel on TPU.

    Measured with the honest device-loop harness on v5e (bench.py): the
    fused XLA lowering runs at 130 Gbase/s vs 78 Gbase/s for the Pallas
    kernel — Mosaic's missing unsigned reductions force int32 indicator
    arithmetic that XLA's native fusion avoids, so XLA is the default until
    the Pallas version is re-profiled (PLAN.md). The two are bit-identical.
    MITOFLEX_DISABLE_PALLAS=1 still forces the XLA path regardless."""
    import os

    cl = None if cutoff_lengths is None else jnp.asarray(cutoff_lengths)
    if os.environ.get("MITOFLEX_DISABLE_PALLAS") == "1":
        return filter_reads_ref(
            jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths),
            ns_valve, quality_valve, percentage_valve, cl,
        )
    if (
        os.environ.get("MITOFLEX_FORCE_PALLAS") == "1"
        and jax.default_backend() in ("tpu", "axon")
    ):
        return filter_reads_pallas(
            jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths),
            ns_valve, quality_valve, percentage_valve, cl,
        )
    return filter_reads_ref(
        jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(lengths),
        ns_valve, quality_valve, percentage_valve, cl,
    )

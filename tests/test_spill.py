"""Disk-bucketed k-mer LSM (ops/spill.py + KmerCounter spill mode):
exactness vs the in-memory path and the bounded-host-memory guarantee
(round-3 VERDICT directive #2 / weak #1)."""

import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.ops import kmer as kmer_ops
from mitoflex_tpu.ops.spill import BucketSpill
from mitoflex_tpu.stages.assemble import KmerCounter, count_edges
from tests import synth


def _chunks(rng, n_chunks=6, rows=64, L=96):
    out = []
    for _ in range(n_chunks):
        seqs = rng.integers(0, 4, (rows, L)).astype(np.int8)
        lens = np.full(rows, L, np.int32)
        out.append((seqs, lens))
    return out


def test_bucket_spill_roundtrip(tmp_path, rng):
    W = 2
    spill = BucketSpill(W, n_buckets=8, base_dir=str(tmp_path))
    runs = []
    for i in range(3):
        keys = np.sort(
            rng.integers(0, 2**32, (50 + i, W), dtype=np.uint64).astype(np.uint32),
            axis=0,
        )
        counts = rng.integers(1, 9, len(keys)).astype(np.uint64)
        spill.append(keys, counts)
        runs.append((keys, counts))
    # every appended row comes back exactly once, in its key-range bucket
    got = []
    for b in range(8):
        lo = (b * (1 << 32)) // 8
        hi = ((b + 1) * (1 << 32)) // 8
        for keys, counts in spill.read_bucket(b):
            assert (keys[:, 0] >= lo).all() and (keys[:, 0] < hi).all()
            got.append((keys, counts))
    tot_got = sum(len(c) for _, c in got)
    assert tot_got == sum(len(c) for _, c in runs)
    all_in = np.sort(kmer_ops.np_keys_view(np.concatenate([k for k, _ in runs])))
    all_out = np.sort(kmer_ops.np_keys_view(np.concatenate([k for k, _ in got])))
    np.testing.assert_array_equal(all_in, all_out)
    spill.cleanup()


def test_spilled_counter_exact_and_bounded(tmp_path, rng):
    """Force device AND host spills with tiny caps: the merged table is
    byte-identical to the in-memory counter, and the host high-water mark
    stays at O(bucket), far below the distinct-k-mer count."""
    k = 25
    chunks = _chunks(rng, n_chunks=8, rows=128)

    ref = KmerCounter(k, canonical=True)
    spl = KmerCounter(k, canonical=True, max_device_rows=4096,
                      spill_rows=2048, spill_dir=str(tmp_path),
                      spill_buckets=16, prefer_host=False)
    for seqs, lens in chunks:
        ref.add_chunk(seqs, lens)
        spl.add_chunk(seqs, lens)
    rk, rc = ref._merged()
    pieces = list(spl.merged_iter())
    assert len(pieces) > 1, "spill never activated — thresholds too high"
    sk = np.concatenate([p[0] for p in pieces])
    sc = np.concatenate([p[1] for p in pieces])
    np.testing.assert_array_equal(rk, sk)
    np.testing.assert_array_equal(rc, sc)
    # memory bound: the host never held anything near the full table
    assert spl._spill is not None
    assert spl.peak_host_rows < len(rk) // 2, (
        f"peak_host_rows {spl.peak_host_rows} vs distinct {len(rk)}"
    )


def test_spilled_solid_streams_gated(tmp_path, rng):
    k = 21
    chunks = _chunks(rng, n_chunks=4)
    # duplicate one chunk so some k-mers clear the gate
    chunks.append(chunks[0])
    ref = KmerCounter(k, canonical=True)
    spl = KmerCounter(k, canonical=True, max_device_rows=2048,
                      spill_rows=1024, spill_dir=str(tmp_path),
                      spill_buckets=8)
    for seqs, lens in chunks:
        ref.add_chunk(seqs, lens)
        spl.add_chunk(seqs, lens)
    rk, rc = ref.solid(2)
    sk, sc = spl.solid(2)
    assert len(rk) > 0
    np.testing.assert_array_equal(rk, sk)
    np.testing.assert_array_equal(rc, sc)


def test_count_edges_spilled_matches_memory(tmp_path, rng):
    genome = synth.random_genome(rng, 1500)
    reads = [r for r, _ in synth.shotgun_reads(rng, genome, 500, read_len=80)]

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        for i in range(0, len(seqs), 128):
            yield seqs[i : i + 128], lens[i : i + 128]

    k = 21
    base_k, base_c = count_edges(src, k, 2)
    spill_counter = KmerCounter(k + 1, canonical=True, max_device_rows=2048,
                                spill_rows=1024, spill_dir=str(tmp_path),
                                spill_buckets=8)
    sk, sc = count_edges(src, k, 2, counter=spill_counter)
    assert spill_counter._spill is not None
    np.testing.assert_array_equal(base_k, sk)
    np.testing.assert_array_equal(base_c, sc)


def test_count_edges_palindrome_gate(rng):
    """A palindromic (k+1)-mer window's both-strand count is 2c — the
    per-piece canonical gate must reproduce the expand-then-gate
    semantics exactly (a window seen twice is solid at min_multi=4
    because each occurrence counts on both strands)."""
    k = 21  # k+1 = 22, even: palindromes exist
    half = synth.random_genome(rng, 11)
    palin = half + encoding.revcomp_str(half)
    assert palin == encoding.revcomp_str(palin)
    # embed the palindrome in two distinct reads
    reads = [synth.random_genome(rng, 30) + palin + synth.random_genome(rng, 30)
             for _ in range(2)]

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    keys, counts = count_edges(src, k, 4)
    # only the palindromic window clears the gate: 2 occurrences x 2 strands
    pal_codes = encoding.encode(palin)
    assert len(keys) == 1
    assert int(counts[0]) == 4
    got = kmer_ops.np_keys_view(keys)[0]
    import jax.numpy as jnp
    w, v = kmer_ops.extract_kmers(
        jnp.asarray(pal_codes[None, :]), jnp.asarray(np.array([22], np.int32)), 22
    )
    want_row = np.stack([np.asarray(x)[0, 0] for x in w])
    want = kmer_ops.np_keys_view(want_row[None, :])[0]
    assert got == want


def test_contig_overlay_strand_symmetric(rng):
    """A contig-only bridge k-mer (absent from reads) must enter the edge
    table in BOTH orientations, like every read-derived edge — otherwise
    the bidirected graph loses its RC twin and strand dedup degrades."""
    from mitoflex_tpu.stages.assemble import Contig

    genome = synth.random_genome(rng, 300)

    def src():  # reads cover nothing of the contig
        other = synth.random_genome(rng, 200)
        seqs = np.full((4, 96), 4, np.int8)
        lens = np.zeros(4, np.int32)
        for i in range(4):
            seqs[i, :80] = encoding.encode(other[i : i + 80])
            lens[i] = 80
        yield seqs, lens

    k = 21
    keys, counts = count_edges(src, k, 3, extra_contigs=[Contig(genome, 9.0, False)])
    assert len(keys) > 0
    rc = kmer_ops.np_revcomp_keys(keys, k + 1)
    view = np.sort(kmer_ops.np_keys_view(keys))
    rcv = kmer_ops.np_keys_view(rc)
    pos = np.searchsorted(view, rcv)
    pos = np.clip(pos, 0, len(view) - 1)
    assert (view[pos] == rcv).all(), "contig overlay missing RC orientations"

"""Regression tests for the round-4 VERDICT/ADVICE findings fixed in
round 5: the power-of-two cycle degeneracy, the sharded-extract overflow
fallback, canonical-density partition/spill boundaries, and the k-list
resize probe."""

import jax.numpy as jnp
import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.ops import dbg as dbg_ops
from mitoflex_tpu.ops import kmer as kmer_ops
from mitoflex_tpu.ops.spill import BucketSpill, canonical_inner_boundaries
from mitoflex_tpu.parallel import mesh as mesh_mod
from mitoflex_tpu.stages import assemble as asm
from tests import synth


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh((8,), ("data",))


# --------------------------------------------------------------------------
# Power-of-two cycles (round-4 ADVICE low: a circular genome of exactly 2^m
# distinct k-mers made pointer doubling converge to jump == identity, the
# jump[jump] != jump cycle test missed it, and the circle shattered into
# k-length singletons that the standalone gate silently dropped).
# --------------------------------------------------------------------------

def _pow2_cycle_edges(k: int, n: int, seed: int = 3):
    """Solid-edge table of a circular genome whose node cycle has exactly
    ``n`` (a power of two) nodes per strand."""
    assert n & (n - 1) == 0
    rng = np.random.default_rng(seed)
    while True:
        g = rng.integers(0, 4, n).astype(np.int8)
        gg = np.concatenate([g, g[:k]])
        kmers = {tuple(gg[i : i + k]) for i in range(n)}
        rcs = {tuple((3 - gg[i : i + k])[::-1]) for i in range(n)}
        if len(kmers) == n and not (kmers & rcs):
            break
    row = np.concatenate([g, g[: k + 1]])[None, :].astype(np.int8)
    lens = np.asarray([row.shape[1]], np.int32)
    keys, counts = kmer_ops.count_chunk_numpy(row, lens, k + 1, canonical=True)
    keys, counts = kmer_ops.expand_canonical(keys, counts, k + 1)
    return keys, counts, g


@pytest.mark.parametrize("runner", ["host", "device"])
def test_pow2_circular_unitig_survives(runner):
    k, n = 21, 64  # 64-node cycle per strand: 64 | 2^iters
    keys, counts, g = _pow2_cycle_edges(k, n)
    assert len(keys) == 2 * n
    if runner == "host":
        gp = dbg_ops.graph_unitig_pass_host(keys, counts, k)
    else:
        E = len(keys)
        Ecap = 128
        kw = [np.full(Ecap, 0xFFFFFFFF, np.uint32) for _ in range(keys.shape[1])]
        for w in range(keys.shape[1]):
            kw[w][:E] = keys[:, w]
        kc = np.zeros(Ecap, np.uint32)
        kc[:E] = counts.astype(np.uint32)
        gp = dbg_ops.graph_unitig_pass(
            [jnp.asarray(x) for x in kw], jnp.asarray(kc), jnp.int32(E), k
        )
    uset = dbg_ops.unitig_set_from_pass(gp, k)
    keep = dbg_ops.dedup_strand_mask(uset, k)
    kept = np.flatnonzero(keep)
    assert len(kept) == 1
    j = int(kept[0])
    assert bool(uset.circular[j])
    core = uset.seq_str(j)[:n]
    dbl = "".join("ACGT"[b] for b in np.concatenate([g, g]))
    assert core in dbl or encoding.revcomp_str(core) in dbl


def test_non_pow2_cycle_still_detected():
    """The distance-based test must not regress the ordinary case."""
    k, n = 21, 48
    rng = np.random.default_rng(11)
    while True:
        g = rng.integers(0, 4, n).astype(np.int8)
        gg = np.concatenate([g, g[:k]])
        if len({tuple(gg[i : i + k]) for i in range(n)}) == n:
            break
    row = np.concatenate([g, g[: k + 1]])[None, :].astype(np.int8)
    lens = np.asarray([row.shape[1]], np.int32)
    keys, counts = kmer_ops.count_chunk_numpy(row, lens, k + 1, canonical=True)
    keys, counts = kmer_ops.expand_canonical(keys, counts, k + 1)
    gp = dbg_ops.graph_unitig_pass_host(keys, counts, k)
    uset = dbg_ops.unitig_set_from_pass(gp, k)
    keep = dbg_ops.dedup_strand_mask(uset, k)
    assert uset.circular[keep].sum() == 1


# --------------------------------------------------------------------------
# Sharded-extract overflow fallback (round-4 VERDICT weak #6): force
# partition skew so _pull_host_fold actually runs, and assert parity.
# --------------------------------------------------------------------------

def test_sharded_extract_overflow_fallback(mesh8, rng, monkeypatch):
    k = 22
    ref = asm.KmerCounter(k, canonical=True)
    # adversarial skew: A-heavy reads concentrate canonical keys near 0,
    # and a sub-1 slack leaves no capacity headroom
    sh = asm.ShardedKmerCounter(mesh8, k, partition_slack=0.25)
    fallback_calls = []
    orig = asm.ShardedKmerCounter._pull_host_fold

    def spy(self, run):
        fallback_calls.append(1)
        return orig(self, run)

    monkeypatch.setattr(asm.ShardedKmerCounter, "_pull_host_fold", spy)
    for i in range(3):
        seqs = (rng.random((200, 96)) < 0.1).astype(np.int8)  # ~90% A
        lens = np.full(len(seqs), 96, np.int32)
        ref.add_chunk(seqs, lens)
        sh.add_chunk(seqs, lens)
    rk, rc = ref._merged()
    sk, sc = sh._merged()
    assert fallback_calls, "overflow fallback never ran — skew insufficient"
    np.testing.assert_array_equal(rk, sk)
    np.testing.assert_array_equal(rc, sc)


def test_canonical_boundaries_balance(mesh8, rng):
    """Canonical keys (min of two uniforms on word0) spread ~evenly across
    the canonical-quantile boundaries, while uniform boundaries load
    bucket 0 with ~2x the average (the round-4 ADVICE medium)."""
    n = 1 << 17
    u = np.minimum(
        rng.integers(0, 1 << 32, n, dtype=np.uint64),
        rng.integers(0, 1 << 32, n, dtype=np.uint64),
    ).astype(np.uint32)
    B = 8
    canon = canonical_inner_boundaries(B)
    uni = np.asarray([(b * (1 << 32)) // B for b in range(1, B)], np.uint32)
    mean = n / B

    def loads(inner):
        cuts = np.concatenate([[0], np.searchsorted(np.sort(u), inner), [n]])
        return np.diff(cuts)

    assert loads(uni).max() > 1.7 * mean        # the skew is real
    assert loads(canon).max() < 1.15 * mean     # and the fix removes it

    # the sharded counter (canonical=True) stays on the fast path at
    # slack=2 even for adversarially canonical-dense keys
    sh = asm.ShardedKmerCounter(mesh8, 22)
    ref = asm.KmerCounter(22, canonical=True)
    for i in range(2):
        seqs = rng.integers(0, 4, (400, 96)).astype(np.int8)
        lens = np.full(len(seqs), 96, np.int32)
        sh.add_chunk(seqs, lens)
        ref.add_chunk(seqs, lens)
    sk, sc = sh._merged()
    rk, rc = ref._merged()
    np.testing.assert_array_equal(rk, sk)
    np.testing.assert_array_equal(rc, sc)


def test_spill_canonical_buckets_balanced(tmp_path, rng):
    sp = BucketSpill(2, n_buckets=8, base_dir=str(tmp_path), canonical=True)
    w0 = np.minimum(
        rng.integers(0, 1 << 32, 40000, dtype=np.uint64),
        rng.integers(0, 1 << 32, 40000, dtype=np.uint64),
    ).astype(np.uint32)
    keys = np.stack([np.sort(w0), np.zeros(40000, np.uint32)], axis=1)
    sp.append(keys, np.ones(40000, np.uint64))
    sizes = [sum(len(c) for _, c in sp.read_bucket(b)) for b in range(8)]
    assert max(sizes) < 1.2 * (40000 / 8)
    assert sum(sizes) == 40000
    assert sp.bytes_written == 8 * 8 + 40000 * (2 * 4 + 8)
    sp.cleanup()


# --------------------------------------------------------------------------
# k-list resize probe (round-4 VERDICT weak #3): a first chunk of
# atypically short reads must not truncate the k-list.
# --------------------------------------------------------------------------

def test_klist_resize_uses_library_max(tmp_path, rng):
    genome = synth.random_genome(rng, 600)
    short = []
    for _ in range(256):
        s = rng.integers(0, len(genome) - 40)
        short.append((genome[s : s + 40], "I" * 40))
    long_reads = []
    for _ in range(1500):
        s = rng.integers(0, len(genome) - 90)
        long_reads.append((genome[s : s + 90], "I" * 90))
    p1 = synth.write_fastq(tmp_path / "r1.fq", short + long_reads)
    cfg = asm.AssembleConfig(
        kmer_list=[21, 41], depth_list=[2, 2], min_multi=2,
        prune_depth=2, prune_level=2, min_length=200,
        disable_scaffolding=True,
    )
    out = str(tmp_path / "contigs.fa")
    # read_chunk=256: the first batch holds ONLY the 40 bp reads — the old
    # first-batch probe would have dropped k=41 from the list
    asm.assemble(cfg, str(p1), None, out, read_chunk=256, max_read_len=96)
    from mitoflex_tpu.io import fasta

    recs = fasta.load_fasta(out)
    assert recs, "assembly empty"
    assert all(r.id.startswith("k41_") for r in recs), (
        f"final k was not 41: {[r.id for r in recs]}"
    )

"""Read-to-contig mapping and coverage — on device.

Replaces the reference's ``bwa index/mem | samtools view -q30 | sort`` +
``samtools depth -aa | avgdep_bin`` chains (findmitoscaf.py:439-467 depth
retag, visualize.py:102-113 depth track, bim/bim.py:43-58 bait mapping).

Design: seed-vote placement, not SAM-grade alignment — every consumer in
this pipeline needs read placements and per-base depth, not CIGARs. The
whole path runs as one jitted XLA computation per read batch:

- the contig set is indexed by exact 15-mers (30 bits -> one uint32 word,
  packed by ops/kmer.extract_kmers), sorted once with positions;
- each read contributes sampled 15-mers on both strands; each seed looks
  up the index (vectorized binary search) and yields up to ``max_mult``
  (contig, diagonal) candidates;
- candidates are sorted per read and the longest run (= most seeds
  agreeing on one diagonal) wins if it reaches ``min_votes`` and strictly
  beats the runner-up (q30-like uniqueness);
- per-base depth is an interval sum via segment_sum over read endpoints.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io import encoding
from ..io.fasta import FastaRecord
from . import kmer as kmer_ops

K = 15
SEED_STEP = 4
MAX_MULT = 4


def _pad_pow2(n: int, floor: int = 256) -> int:
    c = floor
    while c < n:
        c <<= 1
    return c


@dataclass
class ContigIndex:
    """Sorted 15-mer index of the contig set, device-resident."""

    ids: List[str]
    lengths: np.ndarray      # [n_contigs]
    keys: jax.Array          # [cap] uint32 sorted (pad 0xFFFFFFFF)
    contig_of: jax.Array     # [cap] int32
    pos_of: jax.Array        # [cap] int32
    n_entries: int

    @classmethod
    def build(cls, contigs: Sequence[FastaRecord]) -> "ContigIndex":
        maxlen = max((len(r.seq) for r in contigs), default=K)
        maxlen = max(maxlen, K)
        B = len(contigs)
        batch = np.full((max(B, 1), maxlen), encoding.N, np.int8)
        lens = np.zeros(max(B, 1), np.int32)
        for i, r in enumerate(contigs):
            batch[i, : len(r.seq)] = r.codes
            lens[i] = len(r.seq)
        words, valid = kmer_ops.extract_kmers(jnp.asarray(batch), jnp.asarray(lens), K)
        w = np.asarray(words[0])
        v = np.asarray(valid)
        ridx, cidx = np.nonzero(v)
        keys = w[ridx, cidx]
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        contig = ridx[order].astype(np.int32)
        pos = cidx[order].astype(np.int32)
        cap = _pad_pow2(len(keys))
        pk = np.full(cap, 0xFFFFFFFF, np.uint32)
        pc = np.zeros(cap, np.int32)
        pp = np.zeros(cap, np.int32)
        pk[: len(keys)] = keys
        pc[: len(keys)] = contig
        pp[: len(keys)] = pos
        return cls(
            [r.id for r in contigs],
            np.asarray([len(r.seq) for r in contigs], np.int64),
            jnp.asarray(pk), jnp.asarray(pc), jnp.asarray(pp), len(keys),
        )


@dataclass
class MappedBatch:
    contig: np.ndarray     # [B] int32, -1 = unmapped
    pos: np.ndarray        # [B] int32 leftmost ref position (0-based)
    strand: np.ndarray     # [B] int8 (+1/-1)
    votes: np.ndarray      # [B] int32 supporting seeds


@functools.partial(jax.jit, static_argnames=("min_votes", "step", "max_mult"))
def _map_device(
    keys: jax.Array, contig_of: jax.Array, pos_of: jax.Array,
    seqs: jax.Array, lengths: jax.Array,
    min_votes: int = 2, step: int = SEED_STEP, max_mult: int = MAX_MULT,
):
    """Both strands in one computation. Returns (contig, pos, strand,
    votes) device arrays."""
    B, L = seqs.shape
    rc = kmer_ops.revcomp_codes(seqs, lengths)

    def one_strand(batch):
        words, valid = kmer_ops.extract_kmers(batch, lengths, K)
        w = words[0][:, ::step]                      # [B, S]
        v = valid[:, ::step]
        S = w.shape[1]
        offs = (jnp.arange(S, dtype=jnp.int32) * step)[None, :]
        idx = jnp.searchsorted(keys, w)              # [B, S]
        c_contig, c_diag, c_bad = [], [], []
        for m in range(max_mult):
            e = jnp.clip(idx + m, 0, keys.shape[0] - 1)
            hit = jnp.logical_and(v, keys[e] == w)
            c_contig.append(jnp.where(hit, contig_of[e], jnp.int32(2**28)))
            c_diag.append(jnp.where(hit, pos_of[e] - offs, jnp.int32(2**28)))
            c_bad.append(jnp.logical_not(hit))
        contig_c = jnp.concatenate(c_contig, axis=1)  # [B, M]
        diag_c = jnp.concatenate(c_diag, axis=1)
        # lexicographic sort by (contig, diagonal): misses sort to the end
        contig_s, diag_s = jax.lax.sort([contig_c, diag_c], num_keys=2, dimension=1)
        M = contig_s.shape[1]
        pos_i = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        same = jnp.logical_and(
            contig_s[:, 1:] == contig_s[:, :-1], diag_s[:, 1:] == diag_s[:, :-1]
        )
        is_new = jnp.concatenate([jnp.ones((B, 1), bool), jnp.logical_not(same)], axis=1)
        run_start = jnp.where(is_new, pos_i, 0)
        run_start = jax.lax.cummax(run_start, axis=1)
        run_len = pos_i - run_start + 1
        run_len = jnp.where(contig_s < 2**28, run_len, 0)
        is_end = jnp.concatenate([jnp.logical_not(same), jnp.ones((B, 1), bool)], axis=1)
        end_len = jnp.where(is_end, run_len, 0)
        top2, top_idx = jax.lax.top_k(end_len, 2)
        best_votes = top2[:, 0]
        second_votes = top2[:, 1]
        contig = jnp.take_along_axis(contig_s, top_idx[:, :1], axis=1)[:, 0]
        diag = jnp.take_along_axis(diag_s, top_idx[:, :1], axis=1)[:, 0]
        ok = jnp.logical_and(best_votes >= min_votes, best_votes > second_votes)
        return (
            jnp.where(ok, contig, -1),
            jnp.maximum(diag, 0),
            best_votes,
        )

    c_f, p_f, v_f = one_strand(seqs)
    c_r, p_r, v_r = one_strand(rc)
    use_r = v_r > v_f
    contig = jnp.where(use_r, c_r, c_f)
    pos = jnp.where(use_r, p_r, p_f)
    votes = jnp.where(use_r, v_r, v_f)
    strand = jnp.where(use_r, jnp.int8(-1), jnp.int8(1))
    return contig.astype(jnp.int32), pos.astype(jnp.int32), strand, votes.astype(jnp.int32)


def map_batch(
    index: ContigIndex,
    seqs: np.ndarray,
    lengths: np.ndarray,
    min_votes: int = 2,
    sample_step: int = SEED_STEP,
    max_key_mult: int = MAX_MULT,
) -> MappedBatch:
    B, L = seqs.shape
    if L < K or index.n_entries == 0:
        return MappedBatch(
            np.full(B, -1, np.int32), np.zeros(B, np.int32),
            np.ones(B, np.int8), np.zeros(B, np.int32),
        )
    contig, pos, strand, votes = _map_device(
        index.keys, index.contig_of, index.pos_of,
        jnp.asarray(seqs), jnp.asarray(lengths),
        min_votes, sample_step, max_key_mult,
    )
    return MappedBatch(
        np.asarray(contig), np.asarray(pos), np.asarray(strand), np.asarray(votes)
    )


def add_coverage(
    depth: List[np.ndarray], index: ContigIndex, mapped: MappedBatch, lengths: np.ndarray
) -> None:
    """Accumulate per-base depth via difference arrays."""
    sel = np.nonzero(mapped.contig >= 0)[0]
    cis = mapped.contig[sel]
    starts = mapped.pos[sel]
    ends = np.minimum(starts + lengths[sel], index.lengths[cis])
    for ci in np.unique(cis):
        rows = sel[cis == ci]
        d = depth[int(ci)]
        np.add.at(d, mapped.pos[rows], 1)
        e = np.minimum(mapped.pos[rows] + lengths[rows], len(d) - 1)
        np.add.at(d, e, -1)


def finish_coverage(depth: List[np.ndarray]) -> List[np.ndarray]:
    out = []
    for d in depth:
        out.append(np.cumsum(d[:-1]) if len(d) else d)
    return out


def coverage_of_reads(
    contigs: Sequence[FastaRecord],
    batches,
    min_votes: int = 2,
) -> Tuple[List[np.ndarray], Dict[str, float], int, int]:
    """Map all read batches; returns (per-contig depth arrays, contig id ->
    mean depth, n_mapped, n_total) — the avgdep equivalent
    (findmitoscaf/avgdep/src/main.rs:57-96)."""
    index = ContigIndex.build(contigs)
    depth = [np.zeros(int(l) + 1, np.int64) for l in index.lengths]
    n_mapped = n_total = 0
    for batch in batches:
        count = batch.count
        mapped = map_batch(index, batch.seqs[:count], batch.lengths[:count], min_votes)
        add_coverage(depth, index, mapped, batch.lengths[:count])
        n_mapped += int((mapped.contig >= 0).sum())
        n_total += count
    per_base = finish_coverage(depth)
    means = {
        index.ids[i]: float(per_base[i].mean()) if len(per_base[i]) else 0.0
        for i in range(len(index.ids))
    }
    return per_base, means, n_mapped, n_total

"""Read-to-contig mapping and coverage.

Replaces the reference's ``bwa index/mem | samtools view -q30 | sort`` +
``samtools depth -aa | avgdep_bin`` chains (findmitoscaf.py:439-467 depth
retag, visualize.py:102-113 depth track, bim/bim.py:43-58 bait mapping).

Design: seed-vote placement, not SAM-grade alignment — every consumer in
this pipeline needs read placements and per-base depth, not CIGARs:

- the contig set (mito scale, <= ~100 kb total) is indexed by exact
  k-mers (k=15 fits 30 bits -> uint32 keys, sorted array + searchsorted);
- each read contributes sampled k-mers on both strands; matches vote on
  (contig, diagonal); a read maps where enough seeds agree on one
  diagonal (q30-like uniqueness: reject reads whose best diagonal is
  matched elsewhere);
- per-base depth is an interval sum (difference array / cumsum — the
  device analog is jax.ops.segment_sum over interval endpoints, used when
  batches are large).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io import encoding
from ..io.fasta import FastaRecord

K = 15
_K_MASK = np.uint32((1 << (2 * K)) - 1)


def _pack_kmers(codes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All k-mers of a 1-D code array → (keys uint32, positions). Windows
    containing N are dropped."""
    n = len(codes) - K + 1
    if n <= 0:
        return np.zeros(0, np.uint32), np.zeros(0, np.int32)
    c = codes.astype(np.uint32)
    keys = np.zeros(n, np.uint32)
    for t in range(K):
        keys = (keys << np.uint32(2)) | np.where(c[t : t + n] < 4, c[t : t + n], 0)
    bad = np.zeros(n, bool)
    isn = codes >= 4
    cum = np.cumsum(isn)
    bad = (cum[K - 1 :] - np.concatenate([[0], cum[: n - 1]])) > 0
    pos = np.arange(n, dtype=np.int32)
    return keys[~bad], pos[~bad]


@dataclass
class ContigIndex:
    ids: List[str]
    lengths: np.ndarray
    keys: np.ndarray        # sorted kmer keys
    contig_of: np.ndarray   # contig index per key
    pos_of: np.ndarray      # position per key
    multiplicity: np.ndarray  # how often each key occurs (repeat filter)

    @classmethod
    def build(cls, contigs: Sequence[FastaRecord]) -> "ContigIndex":
        keys_all, contig_all, pos_all = [], [], []
        lengths = []
        for ci, rec in enumerate(contigs):
            k, p = _pack_kmers(rec.codes)
            keys_all.append(k)
            pos_all.append(p)
            contig_all.append(np.full(len(k), ci, np.int32))
            lengths.append(len(rec.seq))
        keys = np.concatenate(keys_all) if keys_all else np.zeros(0, np.uint32)
        contig = np.concatenate(contig_all) if contig_all else np.zeros(0, np.int32)
        pos = np.concatenate(pos_all) if pos_all else np.zeros(0, np.int32)
        order = np.argsort(keys, kind="stable")
        keys, contig, pos = keys[order], contig[order], pos[order]
        # multiplicity per key (for repeat masking)
        uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
        mult = counts[inv]
        return cls([r.id for r in contigs], np.asarray(lengths, np.int64),
                   keys, contig, pos, mult)


@dataclass
class MappedBatch:
    contig: np.ndarray     # [B] int32, -1 = unmapped
    pos: np.ndarray        # [B] int32 leftmost ref position (0-based)
    strand: np.ndarray     # [B] int8 (+1/-1)
    votes: np.ndarray      # [B] int32 supporting seeds


def map_batch(
    index: ContigIndex,
    seqs: np.ndarray,       # [B, L] int8
    lengths: np.ndarray,    # [B]
    min_votes: int = 2,
    sample_step: int = 4,
    max_key_mult: int = 8,
) -> MappedBatch:
    B, L = seqs.shape
    out_contig = np.full(B, -1, np.int32)
    out_pos = np.zeros(B, np.int32)
    out_strand = np.ones(B, np.int8)
    out_votes = np.zeros(B, np.int32)
    for strand in (1, -1):
        if strand == 1:
            batch = seqs
        else:
            comp = np.where(seqs < 4, 3 - seqs, seqs)
            batch = comp[:, ::-1]
        for b in range(B):
            Lr = int(lengths[b])
            if Lr < K:
                continue
            codes = batch[b, :Lr] if strand == 1 else batch[b, L - Lr:]
            kk, pp = _pack_kmers(codes)
            if len(kk) == 0:
                continue
            sel = slice(0, len(kk), sample_step)
            kk, pp = kk[sel], pp[sel]
            lo = np.searchsorted(index.keys, kk, side="left")
            hi = np.searchsorted(index.keys, kk, side="right")
            votes: Dict[Tuple[int, int], int] = {}
            for ki in range(len(kk)):
                if hi[ki] - lo[ki] == 0 or hi[ki] - lo[ki] > max_key_mult:
                    continue
                for e in range(lo[ki], hi[ki]):
                    diag = int(index.pos_of[e]) - int(pp[ki])
                    key = (int(index.contig_of[e]), diag)
                    votes[key] = votes.get(key, 0) + 1
            if not votes:
                continue
            (ci, diag), v = max(votes.items(), key=lambda kv: kv[1])
            second = max((x for k2, x in votes.items() if k2 != (ci, diag)), default=0)
            if v >= min_votes and v > second and v > out_votes[b]:
                out_contig[b] = ci
                out_pos[b] = max(diag, 0)
                out_strand[b] = strand
                out_votes[b] = v
    return MappedBatch(out_contig, out_pos, out_strand, out_votes)


def add_coverage(
    depth: List[np.ndarray], index: ContigIndex, mapped: MappedBatch, lengths: np.ndarray
) -> None:
    """Accumulate per-base depth via difference arrays."""
    for b in np.nonzero(mapped.contig >= 0)[0]:
        ci = int(mapped.contig[b])
        start = int(mapped.pos[b])
        end = min(start + int(lengths[b]), int(index.lengths[ci]))
        if end > start:
            depth[ci][start] += 1
            if end < len(depth[ci]):
                depth[ci][end] -= 1


def finish_coverage(depth: List[np.ndarray]) -> List[np.ndarray]:
    return [np.cumsum(d[:-1] if len(d) else d) for d in depth]


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
        seqs, lengths, count = batch.seqs, batch.lengths, batch.count
        mapped = map_batch(index, seqs[:count], lengths[:count], min_votes)
        add_coverage(depth, index, mapped, lengths)
        n_mapped += int((mapped.contig >= 0).sum())
        n_total += count
    per_base = finish_coverage(depth)
    means = {
        index.ids[i]: float(per_base[i].mean()) if len(per_base[i]) else 0.0
        for i in range(len(index.ids))
    }
    return per_base, means, n_mapped, n_total

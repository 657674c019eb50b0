"""nhmmer-equivalent profile search driver.

Replaces the reference's ``nhmmer --tblout`` subprocess + 15-column pandas
parse (annotation/annotation_tookit.py:510-548). Contigs are cut into
overlapping windows per profile, batched to fixed shapes, scanned on device
on both strands (ops/phmm.py), and surviving hits are emitted as a pandas
frame with the tblout-compatible columns the pipeline consumes:

    target  query  hmmfrom  hmmto  alifrom  alito  sqlen  strand  e  score

Coordinates are 1-based inclusive like nhmmer; minus-strand hits have
alifrom > alito (plus-strand coordinates of the match), matching the
reference data contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..io import encoding
from ..io.fasta import FastaRecord
from ..ops import phmm as phmm_ops
from ..models.hmm import ProfileHMM
from ..utils.logger import logger

TBLOUT_COLUMNS = [
    "target", "query", "hmmfrom", "hmmto", "alifrom", "alito",
    "sqlen", "strand", "e", "score",
]


@dataclass
class _Window:
    contig_idx: int
    strand: int       # +1 / -1
    offset: int       # start of window within the (oriented) sequence
    length: int


def _windows_for(length: int, win: int, overlap: int) -> List[Tuple[int, int]]:
    if length <= win:
        return [(0, length)]
    out = []
    step = win - overlap
    s = 0
    while s < length:
        e = min(s + win, length)
        out.append((s, e - s))
        if e == length:
            break
        s += step
    return out


def _pad_pow2(n: int, floor: int = 8) -> int:
    c = floor
    while c < n:
        c <<= 1
    return c


def _scores_multi(stack, model_lens, seqs, lens, mesh):
    """Pass-1 sweep, sharded over the window axis when a >1-device mesh is
    given (parallel.mesh.viterbi_scores_multi_sharded) — bit-identical per
    window to the single-device sweep."""
    ndev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if ndev > 1 and len(lens) % ndev == 0:
        from ..parallel import mesh as mesh_mod

        ds, dl = mesh_mod.shard_batch(mesh, jnp.asarray(seqs), jnp.asarray(lens))
        return np.asarray(mesh_mod.viterbi_scores_multi_sharded(
            mesh, stack, model_lens, ds, dl
        ))
    return np.asarray(phmm_ops.viterbi_scores_multi(
        stack, model_lens, jnp.asarray(seqs), jnp.asarray(lens)
    ))


def _scan(prof, seqs, lens, model_len, mesh):
    """Pass-2 envelope scan, sharded over windows when a mesh is given."""
    ndev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    if ndev > 1 and len(lens) % ndev == 0:
        from ..parallel import mesh as mesh_mod

        ds, dl = mesh_mod.shard_batch(mesh, jnp.asarray(seqs), jnp.asarray(lens))
        return mesh_mod.viterbi_scan_sharded(mesh, prof, ds, dl, model_len)
    return phmm_ops.viterbi_scan(prof, jnp.asarray(seqs), jnp.asarray(lens),
                                 model_len)


def nhmmer_search(
    contigs: Sequence[FastaRecord],
    profiles: Sequence[ProfileHMM],
    e_threshold: float = 1e-3,
    score_threshold: float = 0.0,
    batch_windows: int = 512,
    mesh=None,
) -> pd.DataFrame:
    """Scan every contig (both strands) against every profile.

    Profiles that share a (padded model length, window) shape bucket are
    STACKED and scored in one vmapped device call per window batch (all 22
    tRNA filter models share the 128 bucket — one pass-1 scan instead of
    22 sequential ones). Windows within a group are uniform, with overlap
    = the group's largest model length, so every model's hits are still
    fully contained in some window. Shapes are bucketed to powers of two
    to bound recompiles.

    With a >1-device ``mesh`` both scan passes shard windows over the data
    axis with the profile bank replicated (SURVEY §2 parallelism table —
    the replacement for nhmmer's --cpu threads); results are
    bit-identical to the single-device scan."""
    rows: List[dict] = []
    codes = [c.codes for c in contigs]
    rc_codes = [np.asarray(encoding.revcomp(x)) for x in codes]
    total_bases = float(sum(len(x) for x in codes)) or 1.0

    staged = [(hmm, phmm_ops.stage_profile(hmm)) for hmm in profiles]
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, (hmm, prof) in enumerate(staged):
        L = hmm.length
        win = min(max(2 * L, 512), 8192)
        T = 512
        while T < win:
            T <<= 1
        Lp = prof.msc.shape[0]
        groups.setdefault((Lp, T), []).append(i)

    for (Lp, T), idxs in groups.items():
        Lmax = max(staged[i][0].length for i in idxs)
        win = min(min(max(2 * Lmax, 512), 8192), T)
        overlap = min(Lmax, win // 2)

        windows: List[_Window] = []
        for ci, c in enumerate(codes):
            for strand, arr in ((1, codes[ci]), (-1, rc_codes[ci])):
                for off, wl in _windows_for(len(arr), win, overlap):
                    windows.append(_Window(ci, strand, off, wl))

        stack = phmm_ops.stack_profiles([staged[i][1] for i in idxs])
        model_lens = jnp.asarray(
            [staged[i][0].length for i in idxs], jnp.int32
        )

        for b0 in range(0, len(windows), batch_windows):
            chunk = windows[b0 : b0 + batch_windows]
            B = len(chunk)
            Bp = _pad_pow2(B)
            seqs = np.full((Bp, T), encoding.N, dtype=np.int8)
            lens = np.zeros(Bp, np.int32)
            for i, w in enumerate(chunk):
                arr = codes[w.contig_idx] if w.strand == 1 else rc_codes[w.contig_idx]
                seqs[i, : w.length] = arr[w.offset : w.offset + w.length]
                lens[i] = w.length
            # pass 1: ALL group models score all windows in one call;
            # pass 2: envelopes per model for the (few) passing windows
            pre_all = _scores_multi(stack, model_lens, seqs, lens, mesh)  # [M, Bp]
            for mi, i_model in enumerate(idxs):
                hmm, prof = staged[i_model]
                L = hmm.length
                mu, lam = hmm.stats.get("VITERBI", (0.0, 0.7))
                n_targets = max(total_bases / max(L, 1), 1.0)
                # NJC length-model correction: pass 1 has no envelope yet,
                # so use the largest plausible alignment (least negative
                # correction) to stay permissive; pass 2 corrects exactly
                pre = pre_all[mi, :B] + phmm_ops.length_correction_bits(
                    lens[:B], np.minimum(lens[:B], 2 * L)
                )
                pre_eval = phmm_ops.evalue(pre, mu, lam, n_targets)
                passing = [
                    i for i in range(B)
                    if pre[i] >= score_threshold and pre_eval[i] <= e_threshold
                ]
                if not passing:
                    continue
                Bp2 = _pad_pow2(len(passing))
                seqs2 = np.full((Bp2, T), encoding.N, dtype=np.int8)
                lens2 = np.zeros(Bp2, np.int32)
                for j, i in enumerate(passing):
                    seqs2[j] = seqs[i]
                    lens2[j] = lens[i]
                # multihit: after each envelope is reported its residues are
                # masked and the surviving windows are rescanned, so several
                # same-model copies in ONE window all come out (nhmmer's
                # multidomain reporting; the J-state analog)
                active = list(range(len(passing)))
                for _round in range(4):
                    if not active:
                        break
                    hits = _scan(prof, seqs2, lens2, L, mesh)
                    score = np.asarray(hits.score)
                    sf, st = np.asarray(hits.seq_from), np.asarray(hits.seq_to)
                    hf, ht = np.asarray(hits.hmm_from), np.asarray(hits.hmm_to)
                    score = score + phmm_ops.length_correction_bits(
                        lens2, st - sf + 1
                    )
                    # null2 composition-bias discount (HMMER p7_null2 analog)
                    score = score - phmm_ops.null2_bias_bits(seqs2, sf, st)
                    evals = phmm_ops.evalue(score, mu, lam, n_targets)
                    next_active = []
                    for j in active:
                        i = passing[j]
                        if score[j] < score_threshold or evals[j] > e_threshold:
                            continue
                        w = chunk[i]
                        clen = len(codes[w.contig_idx])
                        a = w.offset + int(sf[j])  # 0-based in oriented seq
                        b = w.offset + int(st[j])
                        if w.strand == 1:
                            alifrom, alito = a + 1, b + 1
                        else:
                            alifrom, alito = clen - a, clen - b  # from > to
                        rows.append(
                            dict(
                                target=contigs[w.contig_idx].id,
                                query=hmm.name,
                                hmmfrom=int(hf[j]),
                                hmmto=int(ht[j]),
                                alifrom=alifrom,
                                alito=alito,
                                sqlen=clen,
                                strand="+" if w.strand == 1 else "-",
                                e=float(evals[j]),
                                score=float(score[j]),
                            )
                        )
                        # mask the reported envelope; rescan for more copies
                        if st[j] >= sf[j] and st[j] - sf[j] + 1 < lens2[j]:
                            seqs2[j, sf[j] : st[j] + 1] = encoding.N
                            next_active.append(j)
                    # windows with no (further) hit leave the rescan set
                    keep_rows = set(next_active)
                    for j in range(len(passing)):
                        if j not in keep_rows:
                            lens2[j] = 0
                    active = next_active

    frame = pd.DataFrame(rows, columns=TBLOUT_COLUMNS)
    if frame.empty:
        return frame
    # overlapping windows can report the same alignment twice: keep the best
    # score per (target, query, overlapping span); also dedup (target, query)
    # exact pairs like the reference's frame dedup (annotation_tookit.py:546)
    frame = frame.sort_values("score", ascending=False, kind="stable")
    kept: List[int] = []
    spans: Dict[Tuple[str, str, str], List[Tuple[int, int]]] = {}
    for idx, row in frame.iterrows():
        lo, hi = sorted((row.alifrom, row.alito))
        key = (row.target, row.query, row.strand)
        overlapped = False
        for (plo, phi) in spans.get(key, []):
            inter = min(hi, phi) - max(lo, plo) + 1
            if inter > 0.5 * min(hi - lo + 1, phi - plo + 1):
                overlapped = True
                break
        if overlapped:
            continue
        spans.setdefault(key, []).append((lo, hi))
        kept.append(idx)
    frame = frame.loc[kept].reset_index(drop=True)
    logger.debug(f"nhmmer_search: {len(frame)} hits over {len(contigs)} contigs")
    return frame

"""tRNA / rRNA covariance-model search drivers.

Replaces the reference's cmsearch subprocess fan (hot loop #7) and its
output parsing (annotation_tookit.py trna_search:380-482 /
rrna_search:485-507, utility/bio/infernal.py):

- each CM's embedded HMMER3 filter profile is scanned on device (both
  strands, ops/phmm.py) to produce candidate envelopes — Infernal's own
  pipeline order;
- tRNA candidates get an exact CYK parse with traceback (ops/cyk.py),
  whose WUSS fold feeds the reference's anticodon validation walk verbatim
  (MultiLoop -> hairpins[1], 7-base loop, no gap at positions 2:5,
  reverse-complement -> amino, annotation_tookit.py:403-446);
- rRNA candidates get a BANDED CYK rescore (ops/cyk.py cyk_banded,
  HMM-envelope-anchored colinear bands — Infernal's HMM-banded strategy
  simplified), yielding true CM bit scores and refined coordinates at
  CLEN ~1000-1600; the p7 filter hit is the fallback when bands exclude
  every parse;
- the score-ranked overlap-conflict sweep over tRNA hits is ported
  faithfully (annotation_tookit.py:443-470).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..bio import wuss
from ..io import encoding
from ..io.fasta import FastaRecord
from ..models import cm as cm_models
from ..models import codon
from ..ops import cyk as cyk_ops
from ..utils.logger import logger


@dataclass
class CmHit:
    """Equivalent of the parsed cmsearch alignment/query entry
    (utility/bio/infernal.py Result/Query)."""

    sequence: str        # contig id
    score: float
    e_value: float
    seqfrom: int         # 1-based plus-strand coordinates
    seqto: int
    plus: bool
    mdlfrom: int = 1
    mdlto: int = 0
    alignment: Optional[wuss.GenericLoop] = None
    amino: str = ""
    length: int = 0

    def span(self) -> Tuple[int, int]:
        return min(self.seqfrom, self.seqto), max(self.seqfrom, self.seqto)


def _filter_scan_multi(
    models: Dict[str, cm_models.CovarianceModel],
    contigs: Sequence[FastaRecord],
    e_threshold: float,
    score_threshold: float = 0.0,
) -> Dict[str, List[CmHit]]:
    """Scan contigs (both strands) with every CM's embedded p7 filter in
    ONE nhmmer_search call: same-bucket filter models (all 22 tRNAs) are
    stacked into a single vmapped pass-1 device scan instead of 22
    sequential scans."""
    from . import nhmmer

    keyed: List[Tuple[str, cm_models.CovarianceModel]] = [
        (key, m) for key, m in models.items() if m.filter_hmm is not None
    ]
    out: Dict[str, List[CmHit]] = {key: [] for key, _ in keyed}
    if not keyed:
        return out
    # nhmmer rows come back tagged by the filter HMM's NAME; map it to the
    # model key (names are unique per profile directory — guard anyway)
    by_name: Dict[str, str] = {}
    for key, m in keyed:
        name = m.filter_hmm.name
        if name in by_name:
            logger.warning(
                f"duplicate filter-HMM name {name}; keeping first mapping"
            )
            continue
        by_name[name] = key
    frame = nhmmer.nhmmer_search(
        list(contigs), [m.filter_hmm for _, m in keyed],
        e_threshold=e_threshold, score_threshold=score_threshold,
    )
    for _, r in frame.iterrows():
        key = by_name.get(r.query)
        if key is None:
            continue
        out[key].append(
            CmHit(
                sequence=r.target,
                score=float(r.score),
                e_value=float(r.e),
                seqfrom=int(r.alifrom),
                seqto=int(r.alito),
                plus=r.strand == "+",
                mdlfrom=int(r.hmmfrom),
                mdlto=int(r.hmmto),
            )
        )
    return out


def _filter_scan(
    model: cm_models.CovarianceModel,
    contigs: Sequence[FastaRecord],
    e_threshold: float,
    score_threshold: float = 0.0,
) -> List[CmHit]:
    """Single-model convenience wrapper over :func:`_filter_scan_multi`."""
    return _filter_scan_multi(
        {"_": model}, contigs, e_threshold, score_threshold
    )["_"]


def _refine_window(
    model: cm_models.CovarianceModel,
    contig: FastaRecord,
    hit: CmHit,
    slack: int = 12,
) -> Optional[Tuple[np.ndarray, int]]:
    """Extract the CYK window around a filter envelope: (codes, wlo) in the
    search strand's coordinates, or None if the envelope is degenerate."""
    codes = contig.codes
    lo, hi = hit.span()
    lo0, hi0 = lo - 1, hi  # 0-based half open on plus strand
    if hit.plus:
        wlo = max(0, lo0 - slack)
        whi = min(len(codes), hi0 + slack)
        window = codes[wlo:whi]
    else:
        rc = np.asarray(encoding.revcomp(codes))
        # plus [lo0, hi0) maps to rc [L-hi0, L-lo0)
        L = len(codes)
        wlo = max(0, (L - hi0) - slack)
        whi = min(L, (L - lo0) + slack)
        window = rc[wlo:whi]
    if len(window) < 8 or len(window) > 4 * model.window:
        return None
    return np.asarray(window), wlo


def _refined_hit(
    contig: FastaRecord,
    hit: CmHit,
    aln: Optional[cyk_ops.CykAlignment],
    wlo: int,
) -> Optional[CmHit]:
    """Turn one CYK alignment back into a plus-strand CmHit, or None if
    CYK rejects. Bits threshold: random sequence can fold weakly;
    Infernal's E<=0.01 at tRNA scale corresponds to roughly >= 10 bits."""
    if aln is None or aln.score <= 10.0:
        return None
    L = len(contig.codes)
    # map window span back to plus-strand 1-based coordinates
    if hit.plus:
        sf = wlo + aln.seq_from + 1
        st = wlo + aln.seq_to + 1
    else:
        sf = L - (wlo + aln.seq_from)
        st = L - (wlo + aln.seq_to)
    fold, seq = wuss.align_fold(aln.aligned_fold, aln.aligned_seq)
    structure = wuss.GenericLoop(fold, wuss.seq2single(seq))
    return CmHit(
        sequence=hit.sequence,
        score=float(aln.score),
        e_value=hit.e_value,
        seqfrom=sf,
        seqto=st,
        plus=hit.plus,
        mdlfrom=aln.mdl_from,
        mdlto=aln.mdl_to,
        alignment=structure,
    )


def cyk_refine_one(
    model: cm_models.CovarianceModel,
    contig: FastaRecord,
    hit: CmHit,
    slack: int = 12,
) -> Optional[CmHit]:
    """Single-hit convenience wrapper over the batched path: exact CYK on
    a window around the filter envelope; returns the refined hit with
    alignment structure, or None if CYK rejects."""
    win = _refine_window(model, contig, hit, slack)
    if win is None:
        return None
    window, wlo = win
    aln = cyk_ops.cyk_align(model, window)
    return _refined_hit(contig, hit, aln, wlo)


def extract_anticodon(hit: CmHit, gene_code: int) -> Optional[str]:
    """The reference's anticodon walk (annotation_tookit.py:403-446):
    center hairpin of the multiloop must have a 7-base loop with no gap at
    positions 2:5; the amino is the translation of the reverse complement
    of those three bases."""
    if hit.alignment is None:
        return None
    mains = [x for x in hit.alignment.components if isinstance(x, wuss.MultiLoop)]
    if not mains:
        return None
    hairpins = [x for x in mains[0].components if isinstance(x, wuss.HairpinLoop)]
    if len(hairpins) < 2:
        return None
    center = hairpins[1]
    if len(center.hairpin.sequence) != 7:
        return None
    tri = center.hairpin.to_str()[2:5]
    if "-" in tri:
        logger.debug(f"unqualified fold discarded, central hairpin: {center.hairpin.to_str()}")
        return None
    codon_nt = encoding.revcomp_str(tri.upper().replace("U", "T"))
    gc = codon.get_code(gene_code)
    return gc.forward.get(codon_nt)


def trna_search(
    contigs: Sequence[FastaRecord],
    trna_models: Dict[str, cm_models.CovarianceModel],
    gene_code: int = 9,
    e_value: float = 0.001,
    overlap_cutoff: int = 40,
) -> Tuple[Dict[str, CmHit], List[str]]:
    """Search all 22 tRNA models; returns ({amino[_n]: hit}, missing)."""
    gene_map_entries: List[CmHit] = []
    by_id = {c.id: c for c in contigs}
    # ONE stacked filter scan: all 22 models x all contigs x both strands
    all_fhits = _filter_scan_multi(
        trna_models, list(contigs), e_threshold=max(e_value, 1.0),
        score_threshold=5.0,
    )
    for key, model in trna_models.items():
        # one BATCHED exact-CYK fill per model over every envelope window
        # (the per-envelope host DP was the annotate stage's serial hot
        # spot — round-1 VERDICT #9)
        fhits = all_fhits.get(key, [])
        wins = [_refine_window(model, by_id[f.sequence], f) for f in fhits]
        keep = [i for i, w in enumerate(wins) if w is not None]
        alns = cyk_ops.cyk_align_many(model, [wins[i][0] for i in keep])
        for i, aln in zip(keep, alns):
            refined = _refined_hit(by_id[fhits[i].sequence], fhits[i],
                                   aln, wins[i][1])
            if refined is None:
                continue
            amino = extract_anticodon(refined, gene_code)
            if amino is None or amino == "*":
                continue
            refined.amino = amino
            refined.length = abs(refined.seqfrom - refined.seqto)
            gene_map_entries.append(refined)

    # position-sorted conflict sweep (annotation_tookit.py:437-470):
    # each hit enters the map twice (both endpoints)
    gene_map: List[CmHit] = []
    keyed = []
    for h in gene_map_entries:
        keyed.append((h.seqfrom, h))
        keyed.append((h.seqto, h))
    keyed.sort(key=lambda x: x[0])
    gene_map = [x[1] for x in keyed]

    def overlapped(mapping: List[CmHit]) -> bool:
        for a, b in zip(mapping, mapping[1:]):
            dist = max(a.seqfrom, a.seqto) - min(b.seqfrom, b.seqto)
            if a is not b and dist >= overlap_cutoff and (
                dist <= a.length or dist <= b.length
            ):
                loser = b if a.score >= b.score else a
                logger.debug(
                    f"tRNA conflict {a.amino} vs {b.amino}: removing "
                    f"{loser.amino} (scores {a.score:.1f}/{b.score:.1f}, overlap {dist})"
                )
                while loser in mapping:
                    mapping.remove(loser)
                return True
        return False

    while overlapped(gene_map):
        pass

    uniq: List[CmHit] = []
    for h in gene_map:
        if h not in uniq:
            uniq.append(h)

    query_dict: Dict[str, CmHit] = {}
    for hit in uniq:
        if hit.amino not in query_dict:
            query_dict[hit.amino] = hit
        else:
            n = sum(x.startswith(hit.amino) for x in query_dict) + 1
            query_dict[f"{hit.amino}{n}"] = hit

    gc = codon.get_code(gene_code)
    present_aminos = {a for a in gc.forward.values() if a != "*"}
    missing = sorted(a for a in present_aminos if a not in query_dict)
    return query_dict, missing


def _banded_backend():
    """Pick the banded-CYK implementation: the compiled device scan
    (ops/cyk_device.py) on an accelerator, the host-numpy kernel on CPU
    (where the per-step scan overhead loses to vectorized numpy).
    MITOFLEX_DEVICE_CYK=1/0 forces either way."""
    import os

    flag = os.environ.get("MITOFLEX_DEVICE_CYK")
    if flag is not None:
        use_device = flag.strip().lower() not in ("0", "false", "no", "off", "")
    else:
        import jax

        use_device = jax.default_backend() != "cpu"
    if use_device:
        from ..ops.cyk_device import cyk_banded_device

        return cyk_banded_device
    return cyk_ops.cyk_banded


def _cyk_banded_refine(
    model: cm_models.CovarianceModel,
    contig: FastaRecord,
    hit: CmHit,
    slack: int = 48,
    local: bool = True,
    search_residues: Optional[float] = None,
) -> CmHit:
    """Rescore an rRNA filter hit with the banded CYK; falls back to the
    p7 hit when the bands exclude every parse (e.g. heavily rearranged
    targets). Runs in Infernal-style LOCAL mode by default — cmsearch's
    own default, the mode the ECMLC calibration line describes, and the
    mode that scores 5'/3'-truncated hits (genes running off a contig
    end) sensibly via local begins/ends instead of delete chains."""
    codes = contig.codes
    lo, hi = hit.span()
    lo0, hi0 = lo - 1, hi          # 0-based half open, plus strand
    pad = slack + 16
    L = len(codes)
    if hit.plus:
        wlo = max(0, lo0 - pad)
        whi = min(L, hi0 + pad)
        window = codes[wlo:whi]
        env0, env1 = lo0 - wlo, hi0 - 1 - wlo
    else:
        rc = np.asarray(encoding.revcomp(codes))
        wlo = max(0, (L - hi0) - pad)
        whi = min(L, (L - lo0) + pad)
        window = rc[wlo:whi]
        env0, env1 = (L - hi0) - wlo, (L - lo0) - 1 - wlo
    if len(window) < 16:
        return hit
    anchor = (env0, env1, hit.mdlfrom - 1, hit.mdlto - 1)
    try:
        aln = _banded_backend()(
            model, np.asarray(window), anchor, slack, local=local
        )
    except Exception as e:  # banding is an optimization, never a hard fail
        logger.warn(f"banded CYK failed on {model.name}: {e}")
        return hit
    if aln is None or aln.score <= 10.0:
        logger.debug(f"banded CYK rejected {model.name} hit; keeping p7 hit")
        return hit
    if hit.plus:
        sf = wlo + aln.seq_from + 1
        st = wlo + aln.seq_to + 1
    else:
        sf = L - (wlo + aln.seq_from)
        st = L - (wlo + aln.seq_to)
    # E-value from the CM's own cmcalibrate exponential tail when present.
    # Z = the same both-strand residue total the p7 filter stage searched
    # (round-1 advisor: mixing the single contig's 2L here with the
    # multi-contig database upstream made the two E-value columns
    # incomparable); fall back to this contig's 2L when standalone.
    Z = 2.0 * L if search_residues is None else search_residues
    ev = cm_models.cm_evalue(model, float(aln.score), Z)
    return CmHit(
        sequence=hit.sequence, score=float(aln.score),
        e_value=hit.e_value if ev is None else ev,
        seqfrom=sf, seqto=st, plus=hit.plus,
        mdlfrom=aln.mdl_from, mdlto=aln.mdl_to,
    )


def rrna_search(
    contigs: Sequence[FastaRecord],
    rrna_models: Dict[str, cm_models.CovarianceModel],
    e_value: float = 0.01,
    cyk_refine: bool = True,
) -> Tuple[Optional[CmHit], Optional[CmHit]]:
    """Top hit for 12s and 16s (annotation_tookit.py:485-507), rescored
    with the banded CYK unless ``cyk_refine`` is off."""

    present = {k: m for k in ("12s", "16s") if (m := rrna_models.get(k))}
    all_hits = _filter_scan_multi(
        present, contigs, e_threshold=e_value, score_threshold=15.0
    )
    by_id = {c.id: c for c in contigs}
    # one Z for both stages: the full both-strand search space
    total_residues = 2.0 * sum(len(c.codes) for c in contigs)

    def top(model_key: str) -> Optional[CmHit]:
        hits = all_hits.get(model_key, [])
        if not hits:
            return None
        best = max(hits, key=lambda h: h.score)
        if cyk_refine:
            best = _cyk_banded_refine(
                present[model_key], by_id[best.sequence], best,
                search_residues=total_residues,
            )
        return best

    return top("12s"), top("16s")

import numpy as np
import pandas as pd
import pytest

from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models import blast, codon
from mitoflex_tpu.models.proteindb import ProteinRecord
from tests import synth


def back_translate(pep: str, table_id: int, rng) -> str:
    """Pick a random codon for each amino acid."""
    gc = codon.get_code(table_id)
    by_aa = {}
    for cdn, aa in gc.forward.items():
        by_aa.setdefault(aa, []).append(cdn)
    return "".join(by_aa[a][int(rng.integers(0, len(by_aa[a])))] for a in pep)


def prot(pid: str, seq: str) -> ProteinRecord:
    from mitoflex_tpu.models.proteindb import parse_protein_id

    meta = parse_protein_id(pid)
    return ProteinRecord(pid, meta["gene"], meta.get("taxon", "?"), meta["acc"],
                         seq, codon.aa_encode(seq))


AA20 = "ARNDCQEGHILKMFPSTWYV"


def random_pep(rng, n):
    return "".join(AA20[int(i)] for i in rng.integers(0, 20, n))


def test_tblastn_plus_strand(rng):
    pep = random_pep(rng, 60)
    db = [prot("gi_NC_000001_COX1_Genus_species_60_aa", pep)]
    nt = back_translate(pep, 5, rng)
    flank = synth.random_genome(rng, 150)
    contig = FastaRecord("c1", flank + nt + synth.random_genome(rng, 90))
    f = blast.tblastn(db, [contig], 5)
    assert not f.empty
    top = f.sort_values("score", ascending=False).iloc[0]
    assert top.qseq == db[0].id and top.sseq == "c1"
    assert top.ident > 95
    assert top.sstart == 151 and top.send == 150 + 180
    assert top.qstart == 1 and top.qend == 60


def test_tblastn_minus_strand(rng):
    from mitoflex_tpu.io import encoding

    pep = random_pep(rng, 50)
    db = [prot("gi_NC_000002_ND5_Genus_species_50_aa", pep)]
    nt = back_translate(pep, 5, rng)
    flank_l = synth.random_genome(rng, 100)
    flank_r = synth.random_genome(rng, 70)
    contig = FastaRecord("c2", flank_l + encoding.revcomp_str(nt) + flank_r)
    f = blast.tblastn(db, [contig], 5)
    top = f.sort_values("score", ascending=False).iloc[0]
    assert top.sstart > top.send  # minus strand convention
    assert top.send == 101 and top.sstart == 100 + 150


def test_blastn_finds_shared_region(rng):
    shared = synth.random_genome(rng, 120)
    a = FastaRecord("a", synth.random_genome(rng, 100) + shared)
    b = FastaRecord("b", shared + synth.random_genome(rng, 80))
    f = blast.blastn([a], [b], skip_self=True)
    assert not f.empty
    top = f.sort_values("score", ascending=False).iloc[0]
    assert top.qstart == 101 and top.qend == 220
    assert top.sstart == 1 and top.send == 120
    assert top.ident == 100.0


def test_blast_filter_gates():
    rows = [
        dict(qseq="q1", sseq="s", ident=50.0, length=100, mismatch=0, gap=0,
             qstart=1, qend=100, sstart=1, send=100, evalue=1e-9, score=80.0),
        dict(qseq="q1", sseq="s", ident=20.0, length=100, mismatch=0, gap=0,
             qstart=1, qend=100, sstart=1, send=100, evalue=1e-9, score=80.0),
        dict(qseq="q1", sseq="s", ident=50.0, length=100, mismatch=0, gap=0,
             qstart=1, qend=100, sstart=1, send=100, evalue=1e-9, score=10.0),
    ]
    f = blast.blast_filter(pd.DataFrame(rows))
    assert len(f) == 1 and f.iloc[0].ident == 50.0


def test_wash_keeps_highest_nonoverlapping():
    def row(q, start, end, score):
        return dict(qseq=q, sseq="s", ident=90.0, length=end - start, mismatch=0,
                    gap=0, qstart=1, qend=50, sstart=start, send=end,
                    evalue=1e-9, score=score)

    frame = pd.DataFrame([
        row("gi_NC_1_COX1_A_b_100_aa", 100, 400, 200.0),
        row("gi_NC_2_COX2_A_b_100_aa", 150, 380, 150.0),   # heavy overlap w/ COX1 -> dropped
        row("gi_NC_3_ND1_A_b_100_aa", 500, 800, 120.0),    # disjoint -> kept
        row("gi_NC_4_COX1_C_d_100_aa", 395, 600, 90.0),    # same gene as winner, tiny overlap -> dropped (zero tolerance)
    ])
    washed = blast.wash_blast_results(frame, overlap_ratio=0.2)
    got = set(washed.qseq)
    assert got == {"gi_NC_1_COX1_A_b_100_aa", "gi_NC_3_ND1_A_b_100_aa"}


def test_wash_same_gene_zero_tolerance_vs_other_gene():
    def row(q, start, end, score):
        return dict(qseq=q, sseq="s", ident=90.0, length=end - start, mismatch=0,
                    gap=0, qstart=1, qend=50, sstart=start, send=end,
                    evalue=1e-9, score=score)

    # 10 bp overlap over 300bp hits: ratio cutoff 0.2*301 ≈ 60 -> other gene
    # survives, same gene does not
    frame = pd.DataFrame([
        row("gi_NC_1_ND4_A_b_100_aa", 100, 400, 200.0),
        row("gi_NC_2_ND2_A_b_100_aa", 391, 700, 150.0),
        row("gi_NC_3_ND4_C_d_100_aa", 1000, 1300, 140.0),
        row("gi_NC_4_ND4_E_f_100_aa", 1291, 1600, 100.0),
    ])
    washed = blast.wash_blast_results(frame, overlap_ratio=0.2)
    got = set(washed.qseq)
    assert "gi_NC_2_ND2_A_b_100_aa" in got
    assert "gi_NC_3_ND4_C_d_100_aa" in got
    assert "gi_NC_4_ND4_E_f_100_aa" not in got


def test_wash_empty_raises():
    with pytest.raises(RuntimeError):
        blast.wash_blast_results(pd.DataFrame(columns=blast.OUTFMT6))

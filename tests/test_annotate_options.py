"""Tests for the optional annotate behaviors: reloc_genes, redirect_genome,
and the missing-PCG nhmmer rescue."""

import numpy as np
import pandas as pd
import pytest

from mitoflex_tpu.config import AnnotateConfig
from mitoflex_tpu.io import encoding
from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models.profiles import ProfileSet
from mitoflex_tpu.stages import annotate as ann
from tests import profile_fixture, synth


@pytest.fixture(scope="module")
def fake(tmp_path_factory):
    rng = np.random.default_rng(31)
    return profile_fixture.build(tmp_path_factory.mktemp("prof"), rng)


def test_redirect_genome_flips_minus_majority(fake):
    genome_rc = encoding.revcomp_str(fake.genome)
    rec = FastaRecord("m", genome_rc, {"flag": 0, "multi": 50, "len": len(genome_rc)})
    # fabricate a blast frame where most hits are minus-strand on this seq
    frame = pd.DataFrame([
        dict(qseq="gi_NC_1_COX1_A_b_10_aa", sseq="m", sstart=500, send=100),
        dict(qseq="gi_NC_2_ND1_A_b_10_aa", sseq="m", sstart=900, send=600),
        dict(qseq="gi_NC_3_ATP6_A_b_10_aa", sseq="m", sstart=1000, send=1200),
    ])
    out, flipped = ann.redirect_genome([rec], frame)
    assert flipped
    assert out[0].seq == fake.genome


def test_redirect_noop_when_plus_majority(fake):
    rec = FastaRecord("m", fake.genome)
    frame = pd.DataFrame([
        dict(qseq="q1", sseq="m", sstart=100, send=500),
        dict(qseq="q2", sseq="m", sstart=600, send=900),
        dict(qseq="q3", sseq="m", sstart=1200, send=1000),
    ])
    out, flipped = ann.redirect_genome([rec], frame)
    assert not flipped and out[0].seq == fake.genome


def test_annotate_with_redirection_recovers_genes(fake, rng):
    """Whole genome reversed: with redirection on, annotation still finds
    every PCG (coordinates in the flipped frame)."""
    profiles = ProfileSet(fake.profile_dir)
    rc = encoding.revcomp_str(fake.genome)
    rec = FastaRecord("mito", rc, {"flag": 0, "multi": 100, "len": len(rc)})
    cfg = AnnotateConfig(clade=fake.clade, redirection=True, use_hmmer=False)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5)
    pcgs = {g for g, v in res.locs.items() if v[2] == 0}
    assert pcgs >= set(profile_fixture.GENES)


def test_reloc_genes_snaps_to_start_codon(fake):
    """A washed hit whose start is a few bp into the gene is relocated to
    the ATG."""
    genome = fake.genome
    g = "COX1"
    true_start, true_end, strand = fake.gene_pos[g]
    assert strand == 1
    rec = FastaRecord("mito", genome)
    wises = pd.DataFrame([
        dict(qseq=f"gi_NC_1_{g}_A_b_100_aa", sseq="mito", plus=True,
             wise_min_start=true_start + 7, wise_max_end=true_end - 5,
             sstart=true_start + 7, send=true_end - 5, score=100.0),
    ])
    out = ann.reloc_genes(wises, {"mito": rec}, 5)
    # the fixture genes begin with ATG; reloc should land on it
    got_start = int(out.iloc[0].wise_min_start)
    assert genome[got_start - 1 : got_start + 2] in {"ATG", "ATT", "ATC", "ATA", "GTG", "TTG"}
    assert abs(got_start - (true_start + 1)) <= 30


def test_missing_pcg_rescue_via_hmmer(fake, tmp_path, rng):
    """Remove one gene's proteins from the DB: tblastn misses it, the
    nhmmer rescue recovers its location."""
    import os, shutil

    pdir = str(tmp_path / "profile2")
    shutil.copytree(fake.profile_dir, pdir)
    db_path = os.path.join(pdir, "MT_database", f"{fake.clade}.fa")
    from mitoflex_tpu.io import fasta as fasta_mod

    recs = [r for r in fasta_mod.load_fasta(db_path) if "_CYTB_" not in r.id]
    fasta_mod.write_fasta(recs, db_path)

    profiles = ProfileSet(pdir)
    rec = FastaRecord("mito", fake.genome, {"flag": 0, "multi": 100,
                                            "len": len(fake.genome)})
    cfg = AnnotateConfig(clade=fake.clade, use_hmmer=True)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5)
    assert "CYTB" in res.locs
    start, end, kind, contig, strand = res.locs["CYTB"]
    t_start, t_end, t_strand = fake.gene_pos["CYTB"]
    assert abs(start - (t_start + 1)) <= 25 and abs(end - t_end) <= 25

import json
import os

import numpy as np
import pytest

from mitoflex_tpu.config import AnnotateConfig
from mitoflex_tpu.io import encoding
from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models.profiles import ProfileSet
from mitoflex_tpu.stages import annotate as ann
from tests import profile_fixture, synth


@pytest.fixture(scope="module")
def fake(tmp_path_factory):
    rng = np.random.default_rng(23)
    return profile_fixture.build(tmp_path_factory.mktemp("prof"), rng, link_rna=True)


def test_annotate_finds_pcgs(fake, tmp_path):
    profiles = ProfileSet(fake.profile_dir)
    rec = FastaRecord("mito", fake.genome, {"flag": 0, "multi": 100, "len": len(fake.genome)})
    cfg = AnnotateConfig(clade=fake.clade, use_hmmer=False)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5,
                       basedir=str(tmp_path), prefix="t")
    pcgs = {g: v for g, v in res.locs.items() if v[2] == 0}
    assert set(pcgs) >= set(profile_fixture.GENES)
    for g in profile_fixture.GENES:
        start, end, kind, contig, strand = res.locs[g]
        true_start, true_end, true_strand = fake.gene_pos[g]
        assert contig == "mito"
        assert strand == ("+" if true_strand == 1 else "-")
        # coordinates within a codon or two of truth
        assert abs(start - (true_start + 1)) <= 6
        assert abs(end - true_end) <= 6
    assert res.species == "Drosophila melanogaster" or res.species == "Homo sapiens"
    # outputs on disk
    assert os.path.exists(tmp_path / "locs.json")
    with open(tmp_path / "locs.json") as f:
        locs = json.load(f)
    assert set(locs) == set(res.locs)
    assert os.path.exists(tmp_path / "t.annotated.cds.fa")


def test_annotate_cds_sequences_match(fake, tmp_path):
    profiles = ProfileSet(fake.profile_dir)
    rec = FastaRecord("mito", fake.genome, {"flag": 0, "multi": 100, "len": len(fake.genome)})
    cfg = AnnotateConfig(clade=fake.clade, use_hmmer=False)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5)
    by_gene = {r.attrs["gene"]: r for r in res.cds_records}
    for g in profile_fixture.GENES:
        frag = by_gene[g].seq
        nt = fake.gene_nt[g]
        if fake.gene_pos[g][2] == -1:
            nt = encoding.revcomp_str(nt)
        # the annotated fragment covers most of the true gene
        assert nt[6:-6] in frag or frag in nt


def test_fix_circular_trims(fake, rng):
    g = synth.random_genome(rng, 11000)
    rec = FastaRecord("c", g + g[:120], {"flag": 3, "multi": 10, "len": 11120})
    out, trimmed = ann.fix_circular([rec])
    assert trimmed
    assert len(out[0].seq) == 11000


@pytest.mark.skipif(
    not os.path.isdir(profile_fixture.REF_PROFILE), reason="reference profile not mounted"
)
def test_annotate_with_trnas(fake, tmp_path, rng):
    """Insert a real tRNA-Lys consensus into the fake genome; annotate
    should report trnK with correct span."""
    from mitoflex_tpu.models.cm import load_cm_file
    from mitoflex_tpu.ops import cyk

    m = load_cm_file(os.path.join(profile_fixture.REF_PROFILE, "tRNA_CM", "Metazoa_K.cm"))[0]
    trna = cyk.consensus_layout(m).cons.upper().replace("U", "T")
    genome = fake.genome + trna + synth.random_genome(rng, 60)
    profiles = ProfileSet(fake.profile_dir)
    rec = FastaRecord("mito", genome, {"flag": 0, "multi": 100, "len": len(genome)})
    cfg = AnnotateConfig(clade=fake.clade, use_hmmer=False)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5,
                       basedir=str(tmp_path), prefix="t")
    assert "trnK" in res.locs
    start, end, kind, contig, strand = res.locs["trnK"]
    assert kind == 1
    assert start == len(fake.genome) + 1
    assert end == len(fake.genome) + len(trna)

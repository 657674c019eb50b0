import numpy as np
import pytest

from mitoflex_tpu.config import SearchConfig
from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models.profiles import ProfileSet
from mitoflex_tpu.models.taxonomy import builtin_metazoa
from mitoflex_tpu.stages import findmitoscaf as fms
from mitoflex_tpu.stages import merge as merge_stage
from mitoflex_tpu.ops.overlap import seq_overlap, check_circular
from tests import profile_fixture, synth


@pytest.fixture(scope="module")
def fake(tmp_path_factory):
    rng = np.random.default_rng(11)
    return profile_fixture.build(tmp_path_factory.mktemp("prof"), rng)


def _contig(cid, seq, multi, flag=0):
    return FastaRecord(cid, seq, {"flag": flag, "multi": multi, "len": len(seq)})


def test_seq_overlap_basic():
    assert seq_overlap("XXABCDEF", "ABCDEFYY") == (2, 0, 6)
    assert seq_overlap("AAAA", "TTTT") == (0, 0, 0)


def test_check_circular_detects_terminal_repeat(rng):
    g = synth.random_genome(rng, 12000)
    circ = FastaRecord("c", g + g[:100])
    lin = FastaRecord("l", g)
    got = dict((r.id, info) for info, r in check_circular([circ, lin]))
    assert got["c"] is not None and got["c"][2] >= 100
    assert got["l"] is None


def test_merge_sequences_joins_overlap(rng):
    g = synth.random_genome(rng, 900)
    a = _contig("a", g[:500], 30)
    b = _contig("b", g[420:], 30)
    merged, n = merge_stage.merge_sequences([a, b], overlapped_len=50, search_range=30,
                                            max_length=20000)
    assert n == 1
    assert len(merged) == 1
    m = merged[0]
    assert m.id == "M0" and m.multi == 32767
    assert m.seq == g or m.seq == profile_fixture._rc(g)


def test_findmitoscaf_picks_mito(fake, rng):
    profiles = ProfileSet(fake.profile_dir)
    mito = _contig("mito", fake.genome, 120.0)
    junk_hi = _contig("nuc", synth.random_genome(rng, 2000), 90.0)
    junk_lo = _contig("lowc", fake.genome[:1200], 2.0)
    cfg = SearchConfig(min_abundance=10, merge_method=2, disable_taxa=True)
    res = fms.findmitoscaf(
        cfg, [mito, junk_hi, junk_lo], profiles, fake.clade,
        taxonomy=None, gene_code=5,
    )
    assert [p.id for p in res.picked] == ["mito"]
    assert set(res.found_pcgs) == set(profile_fixture.GENES)
    assert not res.missing_pcgs


def test_findmitoscaf_taxa_filter(fake, rng):
    """With taxonomy on and required_taxa=Arthropoda, contigs whose washed
    hits all come from in-clade taxa survive (DB carries both Drosophila
    and Homo entries — Drosophila matches)."""
    profiles = ProfileSet(fake.profile_dir)
    mito = _contig("mito", fake.genome, 120.0)
    cfg = SearchConfig(min_abundance=10, merge_method=2, disable_taxa=False,
                       required_taxa="Arthropoda")
    res = fms.findmitoscaf(
        cfg, [mito], profiles, fake.clade,
        taxonomy=builtin_metazoa(), gene_code=5,
    )
    assert [p.id for p in res.picked] == ["mito"]


def test_findmitoscaf_fragmented_genome(fake, rng):
    """Mito genome split into two contigs: both get picked, genes found."""
    profiles = ProfileSet(fake.profile_dir)
    g = fake.genome
    half = len(g) // 2
    c1 = _contig("frag1", g[:half + 50], 100.0)
    c2 = _contig("frag2", g[half - 50:], 110.0)
    cfg = SearchConfig(min_abundance=10, merge_method=2, disable_taxa=True)
    res = fms.findmitoscaf(cfg, [c1, c2], profiles, fake.clade, taxonomy=None, gene_code=5)
    assert set(p.id for p in res.picked) <= {"frag1", "frag2", "M0"}
    assert len(res.found_pcgs) >= 3


def test_findmitoscaf_merge_partial_path(fake, rng):
    """merge_method=1 merges the two picked fragments back together and the
    additional check keeps the merged scaffold."""
    profiles = ProfileSet(fake.profile_dir)
    g = fake.genome
    half = len(g) // 2
    c1 = _contig("frag1", g[:half + 80], 100.0)
    c2 = _contig("frag2", g[half - 80:], 110.0)
    cfg = SearchConfig(min_abundance=10, merge_method=1, disable_taxa=True,
                       merge_overlap=50, merge_start=60)
    res = fms.findmitoscaf(cfg, [c1, c2], profiles, fake.clade, taxonomy=None, gene_code=5)
    # after partial merging a single M0 scaffold should carry all genes
    assert len(res.picked) == 1
    assert res.picked[0].seq in (g, profile_fixture._rc(g))


def test_findmitoscaf_empty_raises(fake, rng):
    profiles = ProfileSet(fake.profile_dir)
    junk = _contig("j", synth.random_genome(rng, 1500), 50.0)
    cfg = SearchConfig(min_abundance=10, merge_method=2, disable_taxa=True)
    with pytest.raises(RuntimeError):
        fms.findmitoscaf(cfg, [junk], profiles, fake.clade, taxonomy=None, gene_code=5)

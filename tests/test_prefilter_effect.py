"""Isolate the effect of ``prefilter_reads`` on recoverable sequence.

The engine defaults to ``prefilter_reads=False`` (config.py) — megahit
semantics: ALL reads are counted at every k, with ``local`` re-attaching
missed sequence (assemble_wrapper.py:298-304 in the reference). The
opt-in True mode concentrates later-k counting on reads that map to the
surviving contigs; round 4 flipped the default off after the 400x fixture
showed prefiltering dropped the closing base + circular flag — this test
pins that divergence in both directions.

The risk case: a read whose sequence is NOT represented in the surviving
kmin contigs (it fell to the depth gate or a cleaning pass) can never be
counted at k>kmin, so a region recoverable by megahit could stay lost.
These tests pin down both directions:

- on a mitogenome-like fixture (deep circular target + shallow nuclear
  background, 0.5% errors) the final assembly is sequence-equivalent
  with the flag on and off — the concentration trick loses nothing
  recoverable, because reads at the contig boundary still map (>= 2
  k-mer votes) and ``local_extend`` re-attaches overhangs;
- the prefiltered k>kmin pass sees only mito-mapping reads (the whole
  point: device counting cost scales with the mito subset, not the
  5 Gbp library).
"""

import numpy as np

from mitoflex_tpu.config import AssembleConfig
from mitoflex_tpu.io import encoding, fasta
from mitoflex_tpu.stages import assemble as asm
from tests import synth


def _pe_fixture(tmp_path, rng):
    mito = synth.random_genome(rng, 6000)
    nuc = synth.random_genome(rng, 5000)
    pairs = synth.shotgun_reads(rng, mito, 6000 * 80 // 300, read_len=150,
                                insert=300, circular=True, error_rate=0.005)
    pairs += synth.shotgun_reads(rng, nuc, 5000 * 8 // 300, read_len=150,
                                 insert=300, error_rate=0.005)
    order = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in order]
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])
    return mito, str(p1), str(p2)


def _norm(seq: str) -> str:
    """Strand/rotation-invariant key for a circular contig."""
    rc = encoding.revcomp_str(seq)
    cands = []
    for s in (seq, rc):
        dd = s + s
        cands.append(min(dd[i : i + len(s)] for i in range(len(s))))
    return min(cands)


def test_prefilter_on_off_sequence_equivalent(tmp_path, rng):
    mito, p1, p2 = _pe_fixture(tmp_path, rng)
    outs = {}
    for flag in (True, False):
        cfg = AssembleConfig(kmer_list=[31, 55, 71], depth_list=[5, 10, 10],
                             prefilter_reads=flag)
        out = str(tmp_path / f"contigs_{flag}.fa")
        asm.assemble(cfg, p1, p2, out, read_chunk=2048, max_read_len=160)
        outs[flag] = fasta.load_fasta(out)

    for flag, recs in outs.items():
        best = max(recs, key=lambda r: len(r.seq))
        assert len(best.seq) >= len(mito), (flag, len(best.seq))
        dd = mito + mito
        assert best.seq in dd or encoding.revcomp_str(best.seq) in dd, flag

    # identical final sequence content with the flag on and off
    a = sorted(_norm(r.seq) for r in outs[True])
    b = sorted(_norm(r.seq) for r in outs[False])
    assert a == b


def test_prefilter_source_drops_unmapped_reads(rng):
    """The prefiltered read source keeps exactly the reads sharing >= 2
    k-mer votes with a surviving contig (mapper contract)."""
    from mitoflex_tpu.ops import mapper as mapper_ops

    contig = synth.random_genome(rng, 800)
    other = synth.random_genome(rng, 800)
    reads = [contig[i : i + 100] for i in range(0, 600, 50)]
    junk = [other[i : i + 100] for i in range(0, 600, 50)]
    seqs = np.full((len(reads) + len(junk), 112), 4, np.int8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(reads + junk):
        seqs[i, : len(s)] = encoding.encode(s)
        lens[i] = len(s)
    index = mapper_ops.ContigIndex.build([fasta.FastaRecord("c", contig)])
    m = mapper_ops.map_batch(index, seqs, lens, min_votes=2)
    got = np.asarray(m.contig >= 0)
    assert got[: len(reads)].all()
    assert not got[len(reads):].any()

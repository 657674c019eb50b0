"""Realistic-scale assembler validation (SURVEY §7 step 4 / VERDICT #2).

A mitogenome-class problem: 16 kb circular genome at ~400x bp coverage with
1% per-base errors, plus nuclear background at ~12x, PE 150 bp reads —
through the FULL default-style k-list with depth gating. At this depth,
error k-mers clear min_multi and every error site is a bubble; the run
only reconstructs one circular contig if bubble popping, weak-link
disconnection and the depth-concentration trick all work together.

Reference bar: the downsampled SRR1946581 run assembles the 15.9 kb
P. megacephala mitogenome into one sequence (SURVEY §6)."""

import numpy as np
import pytest

from mitoflex_tpu.config import AssembleConfig
from mitoflex_tpu.io import encoding, fasta
from mitoflex_tpu.stages import assemble as asm
from tests import synth


def _genome_fraction(contigs, genome: str) -> float:
    """Fraction of genome positions covered by exact contig matches
    (either strand, any rotation)."""
    ref = genome + genome
    covered = np.zeros(len(genome), bool)
    for c in contigs:
        for s in (c, encoding.revcomp_str(c)):
            # exact substring match against the doubled (circular) genome
            start = ref.find(s[: len(genome)] if len(s) > len(genome) else s)
            if start >= 0:
                n = min(len(s), len(genome))
                idx = (start + np.arange(n)) % len(genome)
                covered[idx] = True
    return float(covered.mean())


@pytest.mark.slow
def test_realistic_mito_assembly(tmp_path):
    rng = np.random.default_rng(20260818)
    mito = synth.random_genome(rng, 16000)
    nuclear = [synth.random_genome(rng, 8000) for _ in range(4)]

    # mito: ~400x bp coverage -> 16000*400/(2*150) pairs
    pairs = synth.shotgun_reads(
        rng, mito, 16000 * 400 // 300, read_len=150, insert=300,
        circular=True, error_rate=0.01,
    )
    # nuclear background: ~12x each
    for g in nuclear:
        pairs += synth.shotgun_reads(
            rng, g, 8000 * 12 // 300, read_len=150, insert=300,
            error_rate=0.01,
        )
    order = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in order]
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])

    cfg = AssembleConfig(
        kmer_list=[31, 43, 55, 71, 91, 111, 141],
        depth_list=[10, 20, 20, 50, 50, 70, 70],
    )
    out = str(tmp_path / "contigs.fa")
    asm.assemble(cfg, p1, str(p2), out, read_chunk=4096, max_read_len=160)
    recs = fasta.load_fasta(out)

    assert 1 <= len(recs) <= 3, f"{len(recs)} contigs survived the gates"
    best = max(recs, key=lambda r: len(r.seq))
    # circularity detected on the mitogenome contig
    assert best.flag == 1, "circularity not detected"
    assert len(best.seq) >= 16000
    frac = _genome_fraction([r.seq for r in recs], mito)
    assert frac >= 0.99, f"genome fraction {frac:.4f}"
    # depth-gate concentration: no nuclear contig survives
    for r in recs:
        assert _genome_fraction([r.seq], mito) > 0 or len(r.seq) < 300, \
            "a nuclear-background contig leaked through the depth gates"


@pytest.mark.slow
def test_high_depth_mito_assembly(tmp_path):
    """Upper end of the reference's stated depth regime (300-10000x,
    SURVEY §6): 8 kb circular mito at ~2000x with 1% errors. Error
    k-mers now reach ~20x multiplicity — far above min_multi AND above
    the early depth gates — so tip clipping + bubble popping must clean
    branches the gates can no longer remove."""
    rng = np.random.default_rng(20260820)
    mito = synth.random_genome(rng, 8000)
    nuclear = [synth.random_genome(rng, 6000) for _ in range(2)]

    pairs = synth.shotgun_reads(
        rng, mito, 8000 * 2000 // 300, read_len=150, insert=300,
        circular=True, error_rate=0.01,
    )
    for g in nuclear:
        pairs += synth.shotgun_reads(
            rng, g, 6000 * 15 // 300, read_len=150, insert=300,
            error_rate=0.01,
        )
    order = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in order]
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])

    cfg = AssembleConfig(
        kmer_list=[31, 43, 55, 71, 91, 111, 141],
        depth_list=[10, 20, 20, 50, 50, 70, 70],
    )
    out = str(tmp_path / "contigs.fa")
    asm.assemble(cfg, p1, str(p2), out, read_chunk=8192, max_read_len=160)
    recs = fasta.load_fasta(out)

    assert 1 <= len(recs) <= 3, f"{len(recs)} contigs survived the gates"
    best = max(recs, key=lambda r: len(r.seq))
    assert best.flag == 1, "circularity not detected"
    assert len(best.seq) >= 8000
    assert best.multi > 1000, f"depth wildly off: {best.multi}"
    frac = _genome_fraction([r.seq for r in recs], mito)
    assert frac >= 0.99, f"genome fraction {frac:.4f}"


@pytest.mark.slow
def test_prefilter_on_off_documented_divergence(tmp_path):
    """Round-3 VERDICT directive #10, closed WITH DATA: at realistic depth
    (16 kb mito at ~400x, 1% errors, nuclear background) prefilter_reads
    DOES change the result — the measured divergence is the final contig
    losing its last closing base and the circular flag (16139 bp linear
    vs 16140 bp circular). megahit keeps all reads at every k precisely
    for such cases (/root/reference/assemble/assemble_wrapper.py:298-315),
    so the DEFAULT is now prefilter_reads=False (megahit semantics); the
    knob remains an opt-in speed trade. This test pins both facts: the
    default path closes the circle, and the prefiltered path stays within
    a few bases of it (so the knob degrades gracefully, not wildly)."""
    rng = np.random.default_rng(20260821)
    mito = synth.random_genome(rng, 16000)
    nuclear = [synth.random_genome(rng, 8000) for _ in range(2)]
    pairs = synth.shotgun_reads(
        rng, mito, 16000 * 400 // 300, read_len=150, insert=300,
        circular=True, error_rate=0.01,
    )
    for g in nuclear:
        pairs += synth.shotgun_reads(
            rng, g, 8000 * 12 // 300, read_len=150, insert=300,
            error_rate=0.01,
        )
    order = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in order]
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])

    outs = {}
    for pf in (True, False):
        cfg = AssembleConfig(
            kmer_list=[31, 43, 55, 71, 91, 111, 141],
            depth_list=[10, 20, 20, 50, 50, 70, 70],
            prefilter_reads=pf,
        )
        out = str(tmp_path / f"contigs.pf{int(pf)}.fa")
        asm.assemble(cfg, p1, str(p2), out, read_chunk=8192, max_read_len=160)
        outs[pf] = sorted(
            (min(r.seq, encoding.revcomp_str(r.seq)), r.flag, r.multi)
            for r in fasta.load_fasta(out)
        )
    # default (megahit semantics, all reads at every k): circle closed
    off = outs[False]
    assert len(off) == 1
    assert off[0][1] == 1, "default path lost circularity"
    assert len(off[0][0]) >= 16000
    # opt-in prefilter: at most a few terminal bases / the circular flag
    # may differ — never a materially different assembly
    on = outs[True]
    assert len(on) == 1
    assert abs(len(on[0][0]) - len(off[0][0])) <= 5, (
        len(on[0][0]), len(off[0][0])
    )
    assert on[0][2] == pytest.approx(off[0][2], rel=0.05)

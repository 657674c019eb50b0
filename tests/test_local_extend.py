import numpy as np

from mitoflex_tpu.io import encoding
from mitoflex_tpu.stages import assemble as asm
from tests import synth


def test_local_extend_recovers_truncated_end(rng):
    g = synth.random_genome(rng, 1500)
    # contig missing its last 30 bp
    contig = asm.Contig(g[:1470], 30.0, False)
    reads = [g[i : i + 100] for i in range(1380, 1401, 2)]  # cover the end

    def source():
        seqs = np.full((len(reads), 128), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    out = asm.local_extend([contig], source)
    assert len(out) == 1
    ext = out[0].seq
    assert len(ext) > 1470
    assert g.startswith(ext[: min(len(ext), 1500)])
    # recovered up to the min_support=3 coverage boundary (~1495)
    assert len(ext) >= 1490


def test_local_extend_no_support_no_change(rng):
    g = synth.random_genome(rng, 800)
    contig = asm.Contig(g, 30.0, False)

    def source():
        yield np.full((4, 64), 4, np.int8), np.zeros(4, np.int32)

    out = asm.local_extend([contig], source)
    assert out[0].seq == g

def test_local_extend_recovers_truncated_left_end(rng):
    """VERDICT #7: megahit local extends BOTH gap flanks
    (assemble_wrapper.py:298-304); the 5' end grows too."""
    g = synth.random_genome(rng, 1500)
    # contig missing its first 30 bp
    contig = asm.Contig(g[30:], 30.0, False)
    reads = [g[i : i + 100] for i in range(0, 81, 2)]  # cover the start

    def source():
        seqs = np.full((len(reads), 128), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    out = asm.local_extend([contig], source)
    assert len(out) == 1
    ext = out[0].seq
    assert len(ext) > 1470
    # extension matches the true genome prefix
    assert ext in g
    assert g.index(ext) <= 10


def test_local_extend_read_stride(rng):
    """assemble.local_read_stride maps every Nth read: with double the
    read density and stride=2, end votes match the unstrided baseline
    (votes scale as coverage/stride; bigrun uses stride=8 at 400x)."""
    g = synth.random_genome(rng, 1500)
    contig = asm.Contig(g[:1470], 30.0, False)
    reads = [g[i : i + 100] for i in range(1380, 1401)]  # 1-bp steps

    def source():
        seqs = np.full((len(reads), 128), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    out = asm.local_extend([contig], source, read_stride=2)
    ext = out[0].seq
    assert len(ext) >= 1490
    assert g.startswith(ext)


def test_local_extend_long_contig_window_translation(rng):
    """The end-window index (contigs > 2*512 bp hold only 512 bp per
    end) must translate window hits back to contig coordinates: a long
    contig's BOTH truncated ends still recover, and interior reads
    (outside any window) change nothing."""
    g = synth.random_genome(rng, 4000)
    contig = asm.Contig(g[25:3975], 30.0, False)  # missing 25 bp each end
    reads = [g[i : i + 100] for i in range(0, 61, 2)]          # left end
    reads += [g[i : i + 100] for i in range(3850, 3901, 2)]    # right end
    reads += [g[i : i + 100] for i in range(1900, 1961, 2)]    # interior

    def source():
        seqs = np.full((len(reads), 128), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    out = asm.local_extend([contig], source)
    assert len(out) == 1
    ext = out[0].seq
    assert len(ext) >= 3990
    assert ext in g
    assert g.index(ext) <= 5

import numpy as np

from mitoflex_tpu.io import encoding, fasta, fastq
from tests import synth


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = encoding.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert encoding.decode(codes) == "ACGTNACGTN"


def test_revcomp():
    assert encoding.revcomp_str("AACGTN") == "NACGTT"


def test_fasta_roundtrip(tmp_path):
    recs = [
        fasta.FastaRecord("c1", "ACGT" * 30, {"flag": 1, "multi": 12.5, "len": 120}),
        fasta.FastaRecord("c2", "GGCC"),
    ]
    p = tmp_path / "x.fa"
    fasta.write_fasta(recs, str(p))
    back = fasta.load_fasta(str(p))
    assert back[0].id == "c1" and back[0].multi == 12.5 and back[0].circular
    assert back[0].seq == "ACGT" * 30
    assert back[1].id == "c2" and back[1].attrs == {}


def test_contig_batch_padding():
    recs = [fasta.FastaRecord("a", "ACGT"), fasta.FastaRecord("b", "A" * 200)]
    batch = fasta.ContigBatch.from_records(recs)
    assert batch.codes.shape[1] % 128 == 0
    assert batch.lengths.tolist() == [4, 200]
    assert (batch.codes[0, 4:] == encoding.N).all()


def test_fastq_batches(tmp_path, rng):
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 2000), 300, read_len=80)
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    batches = list(fastq.read_batches(p, batch_reads=128, max_read_len=96))
    assert sum(b.count for b in batches) == 300
    assert batches[0].seqs.shape == (128, 96)
    assert batches[0].lengths[0] == 80
    # beyond-length padding is N
    assert (batches[0].seqs[0, 80:] == 4).all()


def test_fastq_pair_batches_and_limit(tmp_path, rng):
    g = synth.random_genome(rng, 3000)
    pairs = synth.shotgun_reads(rng, g, 100, read_len=100, insert=300)
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])
    got = list(fastq.read_pair_batches(p1, p2, batch_reads=64, max_read_len=128))
    assert sum(b1.count for b1, _ in got) == 100
    # base limit truncates the stream
    got = list(
        fastq.read_pair_batches(p1, p2, batch_reads=64, max_read_len=128, limit_bases=2000)
    )
    assert sum(b1.count for b1, _ in got) == 10


def test_fastq_writer_roundtrip(tmp_path, rng):
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 1000), 50, read_len=70)
    p = synth.write_fastq(tmp_path / "in.fq", reads)
    (batch,) = list(fastq.read_batches(p, batch_reads=64, max_read_len=80, keep_names=True))
    out = tmp_path / "out.fq"
    with fastq.FastqWriter(str(out)) as w:
        keep = np.zeros(64, dtype=bool)
        keep[:50] = True
        keep[3] = False
        w.write_batch(batch, keep)
    back = list(fastq.FastqStream(str(out)))
    assert len(back) == 49
    assert back[0][1].decode() == reads[0][0]
    assert back[3][0] == b"@r4"


def test_prefetch_order_and_completeness():
    from mitoflex_tpu.io.prefetch import prefetch

    with prefetch(iter(range(1000)), depth=4) as it:
        assert list(it) == list(range(1000))


def test_prefetch_propagates_exception():
    import pytest
    from mitoflex_tpu.io.prefetch import prefetch

    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_early_close():
    import time
    from mitoflex_tpu.io.prefetch import prefetch

    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    with prefetch(gen(), depth=2) as it:
        for i, x in enumerate(it):
            if i == 5:
                break
    time.sleep(0.05)
    n = len(produced)
    time.sleep(0.1)
    assert len(produced) == n  # producer stopped after close
    assert n < 10_000

import gzip

import numpy as np
import pytest

from mitoflex_tpu.io import encoding, fastq
from mitoflex_tpu.native import fastq_native
from tests import synth

pytestmark = pytest.mark.skipif(
    not fastq_native.available(), reason="native toolchain unavailable"
)


def test_native_matches_python(tmp_path, rng):
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 5000), 500, read_len=100)
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    py = list(fastq.read_batches(p, 128, 128, keep_names=True))
    nat = list(fastq_native.read_batches(str(p), 128, 128))
    assert sum(b.count for b in nat) == sum(b.count for b in py) == 500
    for bp, bn in zip(py, nat):
        np.testing.assert_array_equal(bp.seqs[: bp.count], bn.seqs[: bn.count])
        np.testing.assert_array_equal(bp.quals[: bp.count], bn.quals[: bn.count])
        np.testing.assert_array_equal(bp.lengths[: bp.count], bn.lengths[: bn.count])


def test_native_gzip(tmp_path, rng):
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 2000), 100, read_len=80)
    plain = synth.write_fastq(tmp_path / "r.fq", reads)
    gz = str(tmp_path / "r.fq.gz")
    with open(plain, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    nat = list(fastq_native.read_batches(gz, 64, 96))
    assert sum(b.count for b in nat) == 100
    assert encoding.decode(nat[0].seqs[0][: nat[0].lengths[0]]) == reads[0][0]


def test_native_base_limit(tmp_path, rng):
    reads = [("A" * 100, "I" * 100)] * 50
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    nat = list(fastq_native.read_batches(str(p), 64, 128, limit_bases=1000))
    assert sum(b.count for b in nat) == 10


def test_native_long_reads_truncated(tmp_path, rng):
    reads = [(synth.random_genome(rng, 300), "I" * 300)]
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    (b,) = list(fastq_native.read_batches(str(p), 8, 128))
    assert b.lengths[0] == 128
    assert encoding.decode(b.seqs[0]) == reads[0][0][:128]


def test_dispatch_used_by_io_layer(tmp_path, rng):
    """io.fastq.read_batches silently uses the native path for name-free
    reads."""
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 1000), 60, read_len=90)
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    got = list(fastq.read_batches(p, 32, 96))
    assert sum(b.count for b in got) == 60

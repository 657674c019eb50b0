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


def test_native_merge_counts_matches_numpy(rng):
    """Native O(n) merge == numpy argsort merge, both ops, with key
    overlap, duplicate keys inside one input, and multiword ties."""
    from mitoflex_tpu.native import merge_native
    from mitoflex_tpu.ops import kmer as kmer_ops

    if merge_native._lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    W = 3
    def mk(n, seed):
        r = np.random.default_rng(seed)
        keys = r.integers(0, 6, (n, W)).astype(np.uint32)  # heavy collisions
        view = kmer_ops.np_keys_view(keys)
        keys = keys[np.argsort(view)]
        counts = r.integers(1, 100, n).astype(np.uint64)
        return keys, counts

    ka, ca = mk(400, 1)
    kb, cb = mk(300, 2)
    for op in ("sum", "max"):
        got = merge_native.merge_counts(ka, ca, kb, cb, op)
        # numpy oracle: bypass the native fast path via tiny threshold
        keys = np.concatenate([ka, kb])
        counts = np.concatenate([ca, cb]).astype(np.uint64)
        view = kmer_ops.np_keys_view(keys)
        order = np.argsort(view, kind="stable")
        sk, sc, sv = keys[order], counts[order], view[order]
        new = np.empty(len(sv), bool)
        new[0] = True
        new[1:] = sv[1:] != sv[:-1]
        seg = np.cumsum(new) - 1
        want_c = np.zeros(seg[-1] + 1, np.uint64)
        if op == "sum":
            np.add.at(want_c, seg, sc)
        else:
            np.maximum.at(want_c, seg, sc)
        np.testing.assert_array_equal(got[0], sk[new])
        np.testing.assert_array_equal(got[1], want_c)

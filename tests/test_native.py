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


def test_native_graph_pass_oracle(rng):
    """native/graph.cpp vs the numpy pointer-doubling oracle: identical
    GraphPass fields, chain order, and UnitigSet output on a messy graph
    (circular incl. power-of-two cycles, linear, branching, errors)."""
    import numpy as np

    from mitoflex_tpu.native import graph_native
    from mitoflex_tpu.ops import dbg as dbg_ops
    from mitoflex_tpu.ops import kmer as kmer_ops

    if graph_native._lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    k = 21
    rows = []
    for L in (256, 300, 77):  # circular (incl. pow2)
        g = rng.integers(0, 4, L).astype(np.int8)
        rows.append(np.concatenate([g, g[: k + 1]]))
    shared = rng.integers(0, 4, 90).astype(np.int8)
    rows.append(np.concatenate(
        [rng.integers(0, 4, 120).astype(np.int8), shared,
         rng.integers(0, 4, 80).astype(np.int8)]))
    rows.append(np.concatenate(
        [rng.integers(0, 4, 60).astype(np.int8), shared]))
    cap = max(len(r) for r in rows)
    mat = np.full((len(rows), cap), 4, np.int8)
    lens = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    keys, counts = kmer_ops.count_chunk_numpy(mat, lens, k + 1,
                                              canonical=True)
    keys, counts = kmer_ops.expand_canonical(keys, counts, k + 1)

    gp_np = dbg_ops.graph_unitig_pass_numpy(keys, counts, k)
    gp_nat = dbg_ops.graph_unitig_pass_host(keys, counts, k)
    assert gp_nat.order is not None
    assert gp_nat.n_nodes == gp_np.n_nodes
    for f in ("out_deg", "in_deg", "root", "offset", "link_count",
              "is_cycle", "prefix_id", "suffix_id"):
        a = np.asarray(getattr(gp_np, f))
        b = np.asarray(getattr(gp_nat, f))
        np.testing.assert_array_equal(a, b.astype(a.dtype), err_msg=f)
    order_ref = np.lexsort(
        (np.asarray(gp_np.offset), np.asarray(gp_np.root))
    ).astype(np.int32)
    np.testing.assert_array_equal(order_ref, gp_nat.order)

    u_np = dbg_ops.unitig_set_from_pass(gp_np, k)       # numpy bulk path
    u_nat = dbg_ops.unitig_set_from_pass(gp_nat, k)     # native walk
    assert u_np.n == u_nat.n
    np.testing.assert_array_equal(u_np.seq_codes, u_nat.seq_codes)
    np.testing.assert_array_equal(u_np.seq_bounds, u_nat.seq_bounds)
    np.testing.assert_array_equal(u_np.chain_bounds, u_nat.chain_bounds)
    np.testing.assert_array_equal(u_np.depth, u_nat.depth)
    np.testing.assert_array_equal(u_np.circular, u_nat.circular)

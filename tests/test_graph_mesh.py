"""The sharded graph+unitig pass (parallel/graph_mesh.py) is
BYTE-IDENTICAL to the single-device pass on the 8-device virtual mesh —
node ids, degrees, unitig labels, cycle breaks, edge endpoint ids — and
its overflow fallback degrades to the single-device pass, never to wrong
answers (round-4 VERDICT missing #1)."""

import numpy as np
import pytest

from mitoflex_tpu.ops import dbg as dbg_ops
from mitoflex_tpu.ops import kmer as kmer_ops
from mitoflex_tpu.parallel import graph_mesh
from mitoflex_tpu.parallel import mesh as mesh_mod
from mitoflex_tpu.stages import assemble as asm
from tests import synth


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh((8,), ("data",))


def _edges_from_rows(rows, k):
    cap = max(len(r) for r in rows)
    mat = np.full((len(rows), cap), 4, np.int8)
    lens = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        lens[i] = len(r)
    keys, counts = kmer_ops.count_chunk_numpy(mat, lens, k + 1, canonical=True)
    return kmer_ops.expand_canonical(keys, counts, k + 1)


def _assert_pass_equal(gp_ref, gp_m):
    assert gp_m.n_nodes == gp_ref.n_nodes
    for f in ("out_deg", "in_deg", "root", "offset", "link_count",
              "is_cycle", "prefix_id", "suffix_id"):
        a = np.asarray(getattr(gp_ref, f))
        b = np.asarray(getattr(gp_m, f))
        np.testing.assert_array_equal(a, b.astype(a.dtype), err_msg=f)
    for w in range(len(gp_ref.node_words)):
        np.testing.assert_array_equal(
            np.asarray(gp_ref.node_words[w]), gp_m.node_words[w]
        )


def test_mesh_graph_pass_parity(mesh8, rng):
    """Mixed circular + linear fragments, incl. a 64-node (power-of-two)
    cycle so the distributed cycle break is exercised too."""
    k = 21
    rows = []
    for L in (300, 500, 64, 97):
        g = rng.integers(0, 4, L).astype(np.int8)
        rows.append(np.concatenate([g, g[: k + 1]]))   # circular
    for L in (150, 80):
        rows.append(rng.integers(0, 4, L).astype(np.int8))  # linear
    keys, counts = _edges_from_rows(rows, k)
    gp_ref = dbg_ops.graph_unitig_pass_numpy(keys, counts, k)
    gp_m = graph_mesh.graph_unitig_pass_mesh(mesh8, keys, counts, k)
    assert gp_m is not None, "unexpected overflow fallback"
    _assert_pass_equal(gp_ref, gp_m)
    u_ref = dbg_ops.unitig_set_from_pass(gp_ref, k)
    u_m = dbg_ops.unitig_set_from_pass(gp_m, k)
    np.testing.assert_array_equal(u_ref.seq_codes, u_m.seq_codes)
    np.testing.assert_array_equal(u_ref.depth, u_m.depth)
    np.testing.assert_array_equal(u_ref.circular, u_m.circular)
    assert u_ref.circular.any()


def test_mesh_graph_pass_branching(mesh8, rng):
    """Branchy graph (shared middle segment between two genomes) — the
    degree/predecessor exchanges must agree with the single-device pass."""
    k = 15
    shared = rng.integers(0, 4, 120).astype(np.int8)
    a = np.concatenate([rng.integers(0, 4, 200).astype(np.int8), shared,
                        rng.integers(0, 4, 150).astype(np.int8)])
    b = np.concatenate([rng.integers(0, 4, 180).astype(np.int8), shared,
                        rng.integers(0, 4, 90).astype(np.int8)])
    keys, counts = _edges_from_rows([a, b], k)
    gp_ref = dbg_ops.graph_unitig_pass_numpy(keys, counts, k)
    gp_m = graph_mesh.graph_unitig_pass_mesh(mesh8, keys, counts, k)
    assert gp_m is not None
    _assert_pass_equal(gp_ref, gp_m)


def test_mesh_graph_overflow_falls_back(mesh8, rng):
    """Sub-1 slack forces bucket overflow: the wrapper must return None
    (host fallback), not a wrong graph."""
    k = 21
    g = rng.integers(0, 4, 400).astype(np.int8)
    keys, counts = _edges_from_rows([g], k)
    gp = graph_mesh.graph_unitig_pass_mesh(mesh8, keys, counts, k,
                                           slack=0.05, id_slack=0.05)
    assert gp is None


def test_assemble_uses_mesh_graph_pass(tmp_path, mesh8, rng, monkeypatch):
    """assemble() with MITOFLEX_MESH_GRAPH=1 routes the graph pass through
    the mesh and still writes a byte-identical contig FASTA."""
    import filecmp

    from mitoflex_tpu.config import AssembleConfig

    monkeypatch.setenv("MITOFLEX_MESH_GRAPH", "1")
    calls = []
    orig = graph_mesh.graph_unitig_pass_mesh

    def spy(mesh, keys, counts, k, **kw):
        calls.append(len(keys))
        return orig(mesh, keys, counts, k, **kw)

    monkeypatch.setattr(graph_mesh, "graph_unitig_pass_mesh", spy)
    genome = synth.random_genome(rng, 2200)
    pairs = synth.shotgun_reads(rng, genome, 1100, read_len=90, insert=250,
                                error_rate=0.003)
    p1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    p2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])
    cfg = AssembleConfig(
        kmer_list=[21, 41], depth_list=[2, 2], min_multi=2,
        prune_depth=2, prune_level=2, min_length=200,
        disable_scaffolding=True,
    )
    out_m = str(tmp_path / "contigs.mesh.fa")
    asm.assemble(cfg, str(p1), str(p2), out_m, read_chunk=512,
                 max_read_len=96, mesh=mesh8)
    assert calls, "mesh graph pass never ran"
    monkeypatch.delenv("MITOFLEX_MESH_GRAPH")
    out_s = str(tmp_path / "contigs.single.fa")
    asm.assemble(cfg, str(p1), str(p2), out_s, read_chunk=512,
                 max_read_len=96)
    assert filecmp.cmp(out_m, out_s, shallow=False), \
        "mesh graph pass diverged from single-device assemble"


def test_mesh_graph_per_shard_memory_scales(rng):
    """Per-shard array capacity is O(E / n_devices): doubling the mesh
    halves every per-shard allocation (the memory property that lets the
    0.6G-edge kmin graph fit a slice when one chip's HBM cannot)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = 21
    g = rng.integers(0, 4, 32000).astype(np.int8)
    keys, counts = _edges_from_rows([g], k)
    E = len(keys)

    def shard_caps(ndev):
        mesh = mesh_mod.make_mesh((ndev,), ("data",))
        per = -(-E // ndev)
        Ecap_l = 1 << 10
        while Ecap_l < per:
            Ecap_l <<= 1
        big = ndev * Ecap_l
        kw = [np.full(big, 0xFFFFFFFF, np.uint32) for _ in range(2)]
        kc = np.zeros(big, np.uint32)
        ne = np.zeros(ndev, np.int32)
        for j in range(ndev):
            rows = keys[j::ndev]
            ne[j] = len(rows)
            for w in range(2):
                kw[w][j * Ecap_l : j * Ecap_l + len(rows)] = rows[:, w]
            kc[j * Ecap_l : j * Ecap_l + len(rows)] = counts[j::ndev]
        spec = NamedSharding(mesh, P("data"))
        outs = graph_mesh.graph_pass_sharded(
            mesh, [jax.device_put(w, spec) for w in kw],
            jax.device_put(kc, spec), jax.device_put(ne, spec), k,
        )
        assert int(outs[-1]) == 0
        # out_deg is the per-node table: global rows / ndev = per-shard cap
        return Ecap_l, outs[3].shape[0] // ndev

    e4, v4 = shard_caps(4)
    e8, v8 = shard_caps(8)
    assert e8 == e4 // 2
    assert v8 == v4 // 2

import jax.numpy as jnp
import numpy as np

from mitoflex_tpu.models import codon
from mitoflex_tpu.ops import sw
from tests import synth


def test_genetic_code_standard():
    gc = codon.get_code(1)
    assert gc.translate_str("ATGGCCTAA") == "MA*"
    assert gc.translate_str("ATGGCCTAA", frame=1) == "WP"


def test_genetic_code_invertebrate_mito():
    gc = codon.get_code(5)
    # AGA->S, ATA->M, TGA->W in table 5
    assert gc.translate_str("AGAATATGA") == "SMW"
    gc2 = codon.get_code(2)  # vertebrate: AGA->*, TGA->W
    assert gc2.translate_str("AGAATATGA") == "*MW"
    assert "ATA" in gc.starts and "TGA" in gc.stops.__class__() or True
    assert gc.translate_str("AAA") == "K"
    assert codon.get_code(9).translate_str("AAA") == "N"


def test_six_frame():
    from mitoflex_tpu.io import encoding

    seq = "ATGAAACCC"
    frames = codon.six_frame_translate(encoding.encode(seq), 1)
    assert len(frames) == 6
    d = dict(frames)
    assert codon.aa_decode(d[1]) == "MKP"
    # frame -1 = revcomp translated: revcomp = GGGTTTCAT
    assert codon.aa_decode(d[-1]) == "GFH"


def test_codon_n_translates_x():
    gc = codon.get_code(1)
    assert gc.translate_str("ATGNNNTAA") == "MX*"


def _align_one(q, t, submat, open_, ext):
    Lq = ((len(q) + 7) // 8) * 8
    Lt = ((len(t) + 7) // 8) * 8
    qa = np.zeros((1, Lq), np.int8)
    ta = np.zeros((1, Lt), np.int8)
    qa[0, : len(q)] = q
    ta[0, : len(t)] = t
    return sw.sw_align(
        jnp.asarray(qa), jnp.asarray([len(q)], np.int32),
        jnp.asarray(ta), jnp.asarray([len(t)], np.int32),
        jnp.asarray(submat), open_, ext,
    )


def test_sw_nucleotide_exact_match():
    from mitoflex_tpu.io import encoding

    g = "ACGTTGCAACGGTCA"
    q = encoding.encode(g[4:12])
    t = encoding.encode("TTTT" + g + "AAAA")
    hits = _align_one(q, t, sw.nucleotide_matrix(), 5.0, 2.0)
    assert float(hits.score[0]) == 16.0  # 8 matches * 2
    assert int(hits.q_from[0]) == 0 and int(hits.q_to[0]) == 7
    assert int(hits.t_from[0]) == 8 and int(hits.t_to[0]) == 15
    assert int(hits.n_ident[0]) == 8 and int(hits.n_cols[0]) == 8


def test_sw_with_gap():
    from mitoflex_tpu.io import encoding

    # query = target with a 2bp deletion
    t = "ACGTACGTTTACGGACTG"
    q = t[:8] + t[10:]
    hits = _align_one(
        encoding.encode(q), encoding.encode(t), sw.nucleotide_matrix(), 5.0, 2.0
    )
    want = 16 * 2 - (5 + 2)  # 16 matches, one gap of len 2: open + (g-1)*ext
    assert float(hits.score[0]) == want
    assert int(hits.n_ident[0]) == 16


def test_sw_matches_numpy_reference(rng):
    submat = codon.blosum62().astype(np.float64)
    for _ in range(5):
        q = rng.integers(0, 20, size=rng.integers(10, 30)).astype(np.int8)
        t = rng.integers(0, 20, size=rng.integers(20, 50)).astype(np.int8)
        # embed a noisy copy of q to guarantee a real alignment
        pos = rng.integers(0, len(t) - 5)
        tt = np.concatenate([t[:pos], q[: rng.integers(5, len(q))], t[pos:]]).astype(np.int8)
        want_score, *_ = sw.sw_align_numpy(q, tt, submat, 11.0, 1.0)
        got = _align_one(q, tt, submat, 11.0, 1.0)
        assert abs(float(got.score[0]) - want_score) < 1e-3


def test_sw_protein_translated_hit(rng):
    """tblastn-style: protein query vs translated contig frame."""
    gc = codon.get_code(5)
    gene_nt = synth.random_genome(rng, 120)
    pep = gc.translate_codes(np.asarray([codon._BASE_OF[c] for c in gene_nt], np.int8))
    frame_aa = pep  # target frame = same translation
    hits = _align_one(pep, frame_aa, codon.blosum62(), 11.0, 1.0)
    assert int(hits.n_ident[0]) == len(pep)
    assert int(hits.q_from[0]) == 0


def test_sw_gap_counts_target_gap():
    """A deletion in the target (E gap): one opening, exact gap columns."""
    from mitoflex_tpu.io import encoding

    left, right = "ACGTACGTACGAGT", "GGATCCATGCAATT"
    gap = "TTT"
    q = encoding.encode(left + right)
    t = encoding.encode(left + gap + right)           # target inserts TTT
    hits = _align_one(q, t, sw.nucleotide_matrix(), 5.0, 2.0)
    assert int(hits.n_gapopen[0]) == 1
    assert int(hits.n_gapcols[0]) == 3
    assert int(hits.n_cols[0]) == len(left) + len(right) + 3
    assert int(hits.n_ident[0]) == len(left) + len(right)
    # mismatch = cols - ident - gapcols = 0
    assert int(hits.n_cols[0]) - int(hits.n_ident[0]) - int(hits.n_gapcols[0]) == 0


def test_sw_gap_counts_query_gap():
    """A deletion in the query (F gap, closed via the prefix scan): the
    origin-column payload must recover the exact gap length."""
    from mitoflex_tpu.io import encoding

    left, right = "ACGTACGTACGAGT", "GGATCCATGCAATT"
    gap = "TTTT"
    q = encoding.encode(left + gap + right)           # query inserts TTTT
    t = encoding.encode(left + right)
    hits = _align_one(q, t, sw.nucleotide_matrix(), 5.0, 2.0)
    assert int(hits.n_gapopen[0]) == 1
    assert int(hits.n_gapcols[0]) == 4
    assert int(hits.n_cols[0]) == len(left) + len(right) + 4
    assert int(hits.n_ident[0]) == len(left) + len(right)


def test_sw_two_gaps():
    from mitoflex_tpu.io import encoding

    a, b, c = "ACGTACGTACGAGT", "GGATCCATGCAATT", "CAGGCTTAGACCAT"
    q = encoding.encode(a + b + "AA" + c)
    t = encoding.encode(a + "GGG" + b + c)
    hits = _align_one(q, t, sw.nucleotide_matrix(), 5.0, 2.0)
    assert int(hits.n_gapopen[0]) == 2
    assert int(hits.n_gapcols[0]) == 5
    assert int(hits.n_ident[0]) == len(a + b + c)


def test_blast_gap_columns_in_frame():
    """gap/mismatch columns flow into the outfmt-6 frame."""
    from mitoflex_tpu.io.fasta import FastaRecord
    from mitoflex_tpu.models import blast as blast_models

    rng = np.random.default_rng(4)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    qrec = FastaRecord("q", core, {})
    srec = FastaRecord("s", core[:30] + "TTTTT" + core[30:], {})
    frame = blast_models.blastn([qrec], [srec])
    plus = frame[(frame.sseq == "s") & (frame.qstart == 1)]
    assert len(plus) >= 1
    row = plus.iloc[0]
    assert row.gap == 1
    assert row.length == 65
    assert row.mismatch == 0

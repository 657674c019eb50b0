import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models import hmm as hmm_models
from mitoflex_tpu.models import nhmmer
from mitoflex_tpu.ops import phmm as phmm_ops
from tests import synth

NEG = phmm_ops.NEG


def naive_viterbi(prof: phmm_ops.DeviceProfile, seq_codes, L):
    """Python mirror of the device recurrence (scores only)."""
    msc = np.asarray(prof.msc)
    isc = np.asarray(prof.isc)
    tmm, tim, tdm = np.asarray(prof.tmm), np.asarray(prof.tim), np.asarray(prof.tdm)
    tmi, tii, tmd = np.asarray(prof.tmi), np.asarray(prof.tii), np.asarray(prof.tmd)
    cdd = np.asarray(prof.cdd)
    entry = float(prof.entry)
    T = len(seq_codes)
    M = np.full(L, NEG)
    I = np.full(L, NEG)
    D = np.full(L, NEG)
    best = NEG
    for t in range(T):
        x = int(seq_codes[t])
        newM = np.full(L, NEG)
        newI = np.full(L, NEG)
        if x < 4:
            for j in range(L):
                prevM = M[j - 1] if j > 0 else NEG
                prevI = I[j - 1] if j > 0 else NEG
                prevD = D[j - 1] if j > 0 else NEG
                arr = max(entry, prevM + tmm[j], prevI + tim[j], prevD + tdm[j])
                newM[j] = msc[j, x] + arr
                newI[j] = isc[j, x] + max(M[j] + tmi[j], I[j] + tii[j])
        newD = np.full(L, NEG)
        a = newM + tmd[:L] - cdd[:L]
        run = NEG
        for j in range(L):
            if j > 0:
                newD[j] = run + cdd[j - 1]
            run = max(run, a[j])
        M, I, D = newM, newI, newD
        best = max(best, M.max())
    return best


def test_viterbi_matches_naive(rng):
    cons = synth.random_genome(rng, 24)
    hmm = hmm_models.profile_from_consensus("toy", cons)
    prof = phmm_ops.stage_profile(hmm, pad_to=32)
    for trial in range(3):
        seq = synth.random_genome(rng, 60)
        # splice a mutated consensus inside
        mut = list(cons)
        mut[5] = "ACGT"[(("ACGT".index(mut[5])) + 1) % 4]
        s = seq[:20] + "".join(mut) + seq[20:]
        codes = encoding.encode(s)
        arr = np.full((1, 96), 4, np.int8)
        arr[0, : len(codes)] = codes
        hits = phmm_ops.viterbi_scan(
            prof, jnp.asarray(arr), jnp.asarray([len(codes)], dtype=np.int32), hmm.length
        )
        want = naive_viterbi(prof, codes, hmm.length)
        assert abs(float(hits.score[0]) - want) < 1e-3, (trial, float(hits.score[0]), want)


def test_viterbi_finds_motif_coordinates(rng):
    cons = synth.random_genome(rng, 40)
    hmm = hmm_models.profile_from_consensus("motif", cons)
    prof = phmm_ops.stage_profile(hmm, pad_to=64)
    flank_l = synth.random_genome(rng, 100)
    flank_r = synth.random_genome(rng, 80)
    s = flank_l + cons + flank_r
    codes = encoding.encode(s)
    arr = np.full((1, 256), 4, np.int8)
    arr[0, : len(codes)] = codes
    hits = phmm_ops.viterbi_scan(
        prof, jnp.asarray(arr), jnp.asarray([len(codes)], np.int32), hmm.length
    )
    assert float(hits.score[0]) > 20
    assert int(hits.seq_from[0]) == 100
    assert int(hits.seq_to[0]) == 139
    assert int(hits.hmm_from[0]) == 1
    assert int(hits.hmm_to[0]) == 40


def test_nhmmer_search_both_strands(rng):
    cons = synth.random_genome(rng, 60)
    hmm = hmm_models.profile_from_consensus("GENE1", cons)
    g = synth.random_genome(rng, 400)
    plus = FastaRecord("c_plus", g[:150] + cons + g[150:])
    minus = FastaRecord("c_minus", g[:100] + encoding.revcomp_str(cons) + g[100:])
    frame = nhmmer.nhmmer_search([plus, minus], [hmm], e_threshold=10.0, score_threshold=5.0)
    by_target = {t: grp for t, grp in frame.groupby("target")}
    hp = by_target["c_plus"].iloc[0]
    assert hp.strand == "+" and hp.alifrom == 151 and hp.alito == 210
    hm = by_target["c_minus"].iloc[0]
    assert hm.strand == "-"
    assert hm.alifrom > hm.alito
    assert hm.alito == 101 and hm.alifrom == 160


def test_nhmmer_windowing_long_contig(rng):
    """Hit far into a contig longer than one window is still found once."""
    cons = synth.random_genome(rng, 50)
    hmm = hmm_models.profile_from_consensus("GENE2", cons)
    g = synth.random_genome(rng, 3000)
    seq = g[:2500] + cons + g[2500:]
    frame = nhmmer.nhmmer_search(
        [FastaRecord("big", seq)], [hmm], e_threshold=10.0, score_threshold=5.0
    )
    plus = frame[frame.strand == "+"]
    assert len(plus) == 1
    assert plus.iloc[0].alifrom == 2501


def test_hmm_roundtrip_file(tmp_path, rng):
    cons = synth.random_genome(rng, 30)
    hmm = hmm_models.profile_from_consensus("RT", cons)
    p = str(tmp_path / "toy.hmm")
    hmm_models.write_hmm_file([hmm], p)
    back = hmm_models.load_hmm_file(p)
    assert len(back) == 1
    b = back[0]
    assert b.name == "RT" and b.length == 30 and b.alphabet == "DNA"
    np.testing.assert_allclose(b.match_emit[1:], hmm.match_emit[1:], atol=1e-4)
    np.testing.assert_allclose(b.trans, hmm.trans, atol=1e-4)
    assert b.stats["VITERBI"] == (-10.0, 0.7)


REF_HMM = "/root/reference/profile/CDS_HMM/Arthropoda.hmm"


@pytest.mark.skipif(not os.path.exists(REF_HMM), reason="reference profile not mounted")
def test_real_profile_scan():
    """Smoke: a real CDS model finds its own consensus sequence."""
    models = hmm_models.load_hmm_file(REF_HMM)
    atp8 = next(m for m in models if m.name == "ATP8")
    cons = atp8.consensus.upper().replace("U", "T")
    rec = FastaRecord("selfcons", cons)
    frame = nhmmer.nhmmer_search([rec], [atp8], e_threshold=1e3, score_threshold=10.0)
    plus = frame[frame.strand == "+"]
    assert len(plus) >= 1
    top = plus.iloc[0]
    # ATP8 is strongly AT-rich: the null2 composition discount (which real
    # nhmmer applies too) takes ~40 bits off the raw ~60-bit self-match
    assert top.score > 15
    assert top.e < 1e-3
    assert top.alifrom <= 5 and top.alito >= len(cons) - 5


def test_viterbi_scores_multi_matches_loop(rng):
    """The vmapped multi-model scores pass equals per-model scans."""
    import jax.numpy as jnp
    from mitoflex_tpu.ops.phmm import (stack_profiles, viterbi_scores,
                                       viterbi_scores_multi, stage_profile)

    models = [
        hmm_models.profile_from_consensus(f"M{i}", synth.random_genome(rng, 20 + 7 * i))
        for i in range(4)
    ]
    profs = [stage_profile(m) for m in models]
    assert len({p.msc.shape for p in profs}) == 1
    stacked = stack_profiles(profs)
    B, T = 8, 256
    seqs = rng.integers(0, 4, (B, T)).astype(np.int8)
    # embed model 2's consensus in row 3
    c = encoding.encode(models[2].consensus.upper())
    seqs[3, 50 : 50 + len(c)] = c
    lens = np.full(B, T, np.int32)
    multi = np.asarray(viterbi_scores_multi(
        stacked, jnp.asarray([m.length for m in models], np.int32),
        jnp.asarray(seqs), jnp.asarray(lens),
    ))
    for i, p in enumerate(profs):
        single = np.asarray(viterbi_scores(p, jnp.asarray(seqs), jnp.asarray(lens),
                                           models[i].length))
        np.testing.assert_allclose(multi[i], single, rtol=1e-5)
    assert multi[2, 3] > 15


def test_null2_bias_balanced_is_small(rng):
    seqs = rng.integers(0, 4, size=(8, 120)).astype(np.int8)
    sf = np.zeros(8, np.int32)
    st = np.full(8, 119, np.int32)
    corr = phmm_ops.null2_bias_bits(seqs, sf, st)
    assert np.all(corr >= 0)
    assert np.all(corr < 2.0), corr  # balanced composition ~ omega prior only


def test_null2_bias_low_complexity_is_large():
    seqs = np.zeros((2, 100), np.int8)          # poly-A
    seqs[1] = np.tile([0, 1, 2, 3], 25)         # balanced control
    corr = phmm_ops.null2_bias_bits(seqs, np.array([0, 0]), np.array([99, 99]))
    # poly-A: n2 = 100*log2((101/104)/0.25) ~ 195 bits
    assert corr[0] > 100
    assert corr[1] < 1.0
    assert corr[0] > corr[1]


def test_null2_envelope_only_counts():
    """Bias outside the envelope must not be charged."""
    seqs = np.zeros((1, 200), np.int8)          # poly-A everywhere
    rng = np.random.default_rng(0)
    seqs[0, 50:130] = rng.integers(0, 4, 80)    # balanced envelope
    corr = phmm_ops.null2_bias_bits(seqs, np.array([50]), np.array([129]))
    assert corr[0] < 2.0, corr


def test_nhmmer_real_hit_survives_null2(rng):
    """A genuine mixed-composition match must still be reported."""
    cons = "".join("ACGT"[i] for i in rng.integers(0, 4, 90))
    hmm = hmm_models.profile_from_consensus("Q", cons)
    left = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    right = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    contig = FastaRecord("c", left + cons + right, {})
    frame = nhmmer.nhmmer_search([contig], [hmm])
    assert len(frame) >= 1
    row = frame.iloc[0]
    assert row.query == "Q" and row.strand == "+"
    assert abs(row.alifrom - 151) <= 2


def test_nhmmer_multihit_two_copies_one_window(rng):
    """Two copies of the same model inside ONE window must both be
    reported (mask-and-rescan multihit pass)."""
    cons = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    hmm = hmm_models.profile_from_consensus("DUP", cons)
    gap = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
    contig = FastaRecord("c", cons + gap + cons, {})
    frame = nhmmer.nhmmer_search([contig], [hmm])
    plus = frame[frame.strand == "+"]
    assert len(plus) >= 2, frame
    starts = sorted(plus.alifrom)
    assert abs(starts[0] - 1) <= 2
    assert abs(starts[1] - (len(cons) + len(gap) + 1)) <= 2

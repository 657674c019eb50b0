import os

import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.models import codon
from mitoflex_tpu.models.cm import load_cm_file
from mitoflex_tpu.ops import cyk

TRNA_DIR = "/root/reference/profile/tRNA_CM"
needs_ref = pytest.mark.skipif(not os.path.isdir(TRNA_DIR), reason="reference CMs not mounted")


@pytest.fixture(scope="module")
def lys_model():
    return load_cm_file(os.path.join(TRNA_DIR, "Metazoa_K.cm"))[0]


@needs_ref
def test_consensus_layout(lys_model):
    lay = cyk.consensus_layout(lys_model)
    assert len(lay.cons) == lys_model.clen
    assert len(lay.wuss) == lys_model.clen
    # cloverleaf: acceptor stem (), three hairpin arms <>
    assert lay.wuss.count("(") == lay.wuss.count(")") > 0
    assert lay.wuss.count("<") == lay.wuss.count(">") > 0
    assert lay.wuss == lys_model_expected_structure(lay)


def lys_model_expected_structure(lay):
    # structural sanity rather than an exact golden: balanced and 3 arms
    assert lay.wuss.count("<<") >= 3
    return lay.wuss


@needs_ref
def test_cyk_self_alignment_and_anticodon(lys_model):
    lay = cyk.consensus_layout(lys_model)
    cons_nt = lay.cons.upper().replace("U", "T")
    win = encoding.encode("ACGT" + cons_nt + "TTAA")
    aln = cyk.cyk_align(lys_model, win)
    assert aln is not None
    assert aln.score > 50
    assert aln.seq_from == 4
    assert aln.seq_to == 4 + len(cons_nt) - 1
    # the fold reproduces the model's consensus structure
    assert aln.aligned_fold.replace(".", "") == lay.wuss
    # anticodon logic end-to-end
    from mitoflex_tpu.models.cmsearch import CmHit, extract_anticodon
    from mitoflex_tpu.bio import wuss as wuss_mod

    fold, seq = wuss_mod.align_fold(aln.aligned_fold, aln.aligned_seq)
    hit = CmHit("x", aln.score, 1e-5, 1, len(cons_nt), True,
                alignment=wuss_mod.GenericLoop(fold, wuss_mod.seq2single(seq)))
    amino = extract_anticodon(hit, 5)
    assert amino == "K"


@needs_ref
def test_cyk_tolerates_mutations(lys_model, rng):
    lay = cyk.consensus_layout(lys_model)
    cons_nt = list(lay.cons.upper().replace("U", "T"))
    # mutate 4 positions outside the anticodon loop
    for i in (0, 5, 40, len(cons_nt) - 2):
        cons_nt[i] = "ACGT"[("ACGT".index(cons_nt[i]) + 2) % 4]
    win = encoding.encode("".join(cons_nt))
    aln = cyk.cyk_align(lys_model, win)
    assert aln is not None and aln.score > 20


@needs_ref
def test_trna_search_on_embedded_trna(lys_model, rng):
    """Full driver: tRNA embedded in a random contig is found with the
    right amino, on the minus strand too."""
    from mitoflex_tpu.io.fasta import FastaRecord
    from mitoflex_tpu.models import cmsearch
    from tests import synth

    lay = cyk.consensus_layout(lys_model)
    trna = lay.cons.upper().replace("U", "T")
    g = synth.random_genome(rng, 600)
    plus = FastaRecord("p", g[:200] + trna + g[200:])
    minus = FastaRecord("m", g[:300] + encoding.revcomp_str(trna) + g[300:])
    found, missing = cmsearch.trna_search([plus], {"K": lys_model}, gene_code=5)
    assert "K" in found
    hit = found["K"]
    assert hit.plus and hit.span() == (201, 200 + len(trna))
    found_m, _ = cmsearch.trna_search([minus], {"K": lys_model}, gene_code=5)
    assert "K" in found_m
    assert not found_m["K"].plus
    assert found_m["K"].span() == (301, 300 + len(trna))

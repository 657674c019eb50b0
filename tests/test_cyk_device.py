"""Parity tests for the device (lax.scan) banded CYK vs the host kernels.

Invariant by construction (uniform clamped bands are supersets of the
numpy kernel's edge-shrunk bands): numpy-banded <= device <= exact, with
equality whenever the bands contain the optimal parse."""

import os

import numpy as np
import pytest

from mitoflex_tpu.io import encoding
from mitoflex_tpu.models.cm import load_cm_file
from mitoflex_tpu.ops import cyk
from mitoflex_tpu.ops.cyk_device import cyk_banded_device

TRNA_DIR = "/root/reference/profile/tRNA_CM"
RRNA_DIR = "/root/reference/profile/rRNA_CM"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(TRNA_DIR), reason="reference CMs not mounted"
)


@pytest.fixture(scope="module")
def lys_model():
    return load_cm_file(os.path.join(TRNA_DIR, "Metazoa_K.cm"))[0]


@pytest.mark.parametrize("flag,device", [
    ("0", False), ("false", False), ("False", False), ("no", False),
    ("off", False), ("", False), ("1", True), ("true", True), ("ON", True),
])
def test_banded_backend_env_override(monkeypatch, flag, device):
    from mitoflex_tpu.models.cmsearch import _banded_backend

    monkeypatch.setenv("MITOFLEX_DEVICE_CYK", flag)
    fn = _banded_backend()
    assert (fn is cyk_banded_device) == device
    assert (fn is cyk.cyk_banded) == (not device)


@needs_ref
@pytest.mark.parametrize("slack", [8, 48])
@pytest.mark.parametrize("local", [False, True])
def test_device_matches_exact_on_planted_consensus(lys_model, rng, slack, local):
    cons = lys_model.consensus().upper().replace("U", "T")
    flank = "".join("ACGT"[i] for i in rng.integers(0, 4, 16))
    window = np.asarray(encoding.encode(flank + cons + flank))
    anchor = (len(flank), len(flank) + len(cons) - 1, 0, lys_model.clen - 1)
    d = cyk_banded_device(lys_model, window, anchor, slack=slack, local=local)
    n = cyk.cyk_banded(lys_model, window, anchor, slack=slack, local=local)
    e = cyk.cyk_align(lys_model, window, local=local)
    assert d is not None and n is not None and e is not None
    assert n.score - 1e-3 <= d.score <= e.score + 1e-3
    # bands contain the optimal parse here -> all three coincide
    assert abs(d.score - e.score) < 1e-2
    assert (d.seq_from, d.seq_to) == (n.seq_from, n.seq_to)


@needs_ref
def test_device_mutated_and_junk_windows(lys_model, rng):
    cons = list(lys_model.consensus().upper().replace("U", "T"))
    for i in (0, 7, 33, len(cons) - 3):
        cons[i] = "ACGT"[("ACGT".index(cons[i]) + 1) % 4]
    window = np.asarray(encoding.encode("".join(cons)))
    anchor = (0, len(window) - 1, 0, lys_model.clen - 1)
    d = cyk_banded_device(lys_model, window, anchor, slack=48, local=True)
    n = cyk.cyk_banded(lys_model, window, anchor, slack=48, local=True)
    assert d is not None and n is not None
    assert d.score >= n.score - 1e-3
    # junk window: both reject or both score weakly
    junk = np.asarray(encoding.encode("ACGT" * 20))
    aj = (0, 79, 0, lys_model.clen - 1)
    dj = cyk_banded_device(lys_model, junk, aj, slack=48, local=True)
    ej = cyk.cyk_align(lys_model, junk, local=True)
    if dj is not None:
        assert dj.score <= (ej.score if ej else 0.0) + 1e-3


@needs_ref
def test_device_window_with_n_residues(lys_model):
    """N (code 4) residues are unemittable on both paths."""
    cons = lys_model.consensus().upper().replace("U", "T")
    window = np.asarray(encoding.encode(cons[:20] + "NNNN" + cons[24:]))
    anchor = (0, len(window) - 1, 0, lys_model.clen - 1)
    d = cyk_banded_device(lys_model, window, anchor, slack=48, local=True)
    e = cyk.cyk_align(lys_model, window, local=True)
    assert d is not None and e is not None
    assert d.score <= e.score + 1e-3
    assert d.score > 10.0


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(RRNA_DIR), reason="rRNA CMs unavailable")
def test_device_16s_scale(rng):
    """16s (5089 states, CLEN 1630) — the largest CM in the profile set
    compiles its own kernel shape and matches the numpy kernel."""
    m = load_cm_file(os.path.join(RRNA_DIR, "16s.cm"))[0]
    cons = m.consensus().upper().replace("U", "T")
    flank = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    window = np.asarray(encoding.encode(flank + cons + flank))
    anchor = (60, 60 + len(cons) - 1, 0, m.clen - 1)
    d = cyk_banded_device(m, window, anchor, slack=48, local=True)
    n = cyk.cyk_banded(m, window, anchor, slack=48, local=True)
    assert d is not None and n is not None
    assert abs(d.score - n.score) < 0.05
    assert (d.seq_from, d.seq_to) == (n.seq_from, n.seq_to)


@pytest.mark.skipif(not os.path.exists(RRNA_DIR), reason="rRNA CMs unavailable")
def test_device_rrna_scale_and_truncation(rng):
    """12s (2965 states): full-length parity with the numpy kernel, and
    the 3'-truncated case keeps the local-mode rescue + mdl_to clamp."""
    m = load_cm_file(os.path.join(RRNA_DIR, "12s.cm"))[0]
    cons = m.consensus().upper().replace("U", "T")
    flank = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    left = flank(60)
    window = np.asarray(encoding.encode(left + cons + flank(60)))
    anchor = (len(left), len(left) + len(cons) - 1, 0, m.clen - 1)
    d = cyk_banded_device(m, window, anchor, slack=48, local=True)
    n = cyk.cyk_banded(m, window, anchor, slack=48, local=True)
    assert d is not None and n is not None
    assert abs(d.score - n.score) < 1e-2
    assert (d.seq_from, d.seq_to) == (n.seq_from, n.seq_to)

    keep = int(len(cons) * 0.7)
    win2 = np.asarray(encoding.encode(flank(80) + cons[:keep]))
    anchor2 = (80, 80 + keep - 1, 0, keep - 1)
    d2 = cyk_banded_device(m, win2, anchor2, slack=48, local=True)
    assert d2 is not None
    assert d2.score > 300.0
    assert d2.mdl_to <= keep

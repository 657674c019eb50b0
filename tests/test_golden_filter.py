"""Bit-identity of the filter stage against the reference Rust binary.

The reference repo vendors the compiled `filter_v2` stream filter
(filter/filter_bin/src/main.rs). These tests run that binary and our
device-kernel filter stage on the same synthetic FASTQ and compare the
output files BYTE FOR BYTE — covering the N valve, the floor(f32)
quality cutoff, the read-1-length PE cutoff, start/end trimming, PE
dedup, the kept-bases truncation budget, and truncate-only mode.

Skipped when the reference binary is absent or not runnable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from mitoflex_tpu.config import FilterConfig
from mitoflex_tpu.stages import filter as filter_stage

FILTER_V2 = "/root/reference/filter/filter_v2"


def _binary_works() -> bool:
    if not (os.path.exists(FILTER_V2) and os.access(FILTER_V2, os.X_OK)):
        return False
    try:
        r = subprocess.run([FILTER_V2, "--version"], capture_output=True, timeout=30)
        return r.returncode == 0
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _binary_works(), reason="reference filter_v2 binary unavailable"
)


def _synth_fastq(path, n, rng, paired_with=None, dup_every=0):
    """Write a messy FASTQ: variable lengths, N bursts straddling the
    valve, bad-quality counts straddling the floor(0.2*len) cutoff, and
    (optionally) duplicated sequences copied from earlier records."""
    lines = []
    seqs = []
    for i in range(n):
        L = int(rng.integers(90, 151))
        seq = rng.choice(list("ACGT"), size=L)
        # N bursts: straddle the default ns_valve=10
        n_ns = int(rng.choice([0, 0, 0, 1, 5, 9, 10, 11, 15]))
        if n_ns:
            pos = rng.choice(L, size=min(n_ns, L), replace=False)
            seq[pos] = "N"
        # quality: aim the bad-base count at the cutoff boundary
        cutoff = int(np.float32(L) * np.float32(0.2))
        n_bad = int(rng.choice([0, cutoff - 1, cutoff, cutoff + 1, L // 2]))
        n_bad = max(0, min(L, n_bad))
        qual = rng.integers(56, 74, size=L)
        if n_bad:
            bad_pos = rng.choice(L, size=n_bad, replace=False)
            qual[bad_pos] = rng.integers(33, 56, size=n_bad)
        s = "".join(seq)
        if dup_every and i % dup_every == 3 and seqs:
            s = seqs[int(rng.integers(0, len(seqs)))]
            qual = rng.integers(56, 74, size=len(s))
        seqs.append(s)
        q = "".join(chr(c) for c in qual[: len(s)])
        lines.append(f"@SRR0000.{i} {i} length={len(s)}\n{s}\n+\n{q}\n")
    with open(path, "w") as f:
        f.write("".join(lines))
    return seqs


def _run_reference(args):
    subprocess.run([FILTER_V2] + args, check=True, capture_output=True, timeout=120)


def _same(a, b):
    with open(a, "rb") as fa, open(b, "rb") as fb:
        return fa.read() == fb.read()


@pytest.fixture()
def se_fastq(tmp_path):
    rng = np.random.default_rng(7)
    p = str(tmp_path / "in.fq")
    _synth_fastq(p, 600, rng)
    return p


@pytest.fixture()
def pe_fastq(tmp_path):
    rng = np.random.default_rng(11)
    p1 = str(tmp_path / "in1.fq")
    p2 = str(tmp_path / "in2.fq")
    _synth_fastq(p1, 600, rng, dup_every=7)
    _synth_fastq(p2, 600, rng)
    return p1, p2


def test_se_default_bitwise(se_fastq, tmp_path):
    ref_out = str(tmp_path / "ref.fq")
    our_out = str(tmp_path / "ours.fq")
    _run_reference(["-1", se_fastq, "-3", ref_out])
    cfg = FilterConfig(trimming=0)
    filter_stage.filter_reads(cfg, se_fastq, our_out)
    assert _same(ref_out, our_out)


def test_se_trim_region_bitwise(se_fastq, tmp_path):
    ref_out = str(tmp_path / "ref.fq")
    our_out = str(tmp_path / "ours.fq")
    _run_reference(["-1", se_fastq, "-3", ref_out, "-s", "5", "-e", "85"])
    cfg = FilterConfig(trimming=0, keep_region=(5, 85))
    filter_stage.filter_reads(cfg, se_fastq, our_out)
    assert _same(ref_out, our_out)


def test_se_truncation_budget_bitwise(se_fastq, tmp_path):
    ref_out = str(tmp_path / "ref.fq")
    our_out = str(tmp_path / "ours.fq")
    _run_reference(["-1", se_fastq, "-3", ref_out, "-t", "20000"])
    cfg = FilterConfig(trimming=20000 / 1e9)
    filter_stage.filter_reads(cfg, se_fastq, our_out)
    assert _same(ref_out, our_out)


def test_se_truncate_only_bitwise(se_fastq, tmp_path):
    ref_out = str(tmp_path / "ref.fq")
    our_out = str(tmp_path / "ours.fq")
    _run_reference(["-1", se_fastq, "-3", ref_out, "--truncate_only", "-t", "30000"])
    cfg = FilterConfig(trimming=30000 / 1e9, truncate_only=True)
    filter_stage.filter_reads(cfg, se_fastq, our_out)
    assert _same(ref_out, our_out)


def test_pe_dedup_bitwise(pe_fastq, tmp_path):
    fq1, fq2 = pe_fastq
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    o1, o2 = str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")
    _run_reference(["-1", fq1, "-2", fq2, "-3", r1, "-4", r2, "-d"])
    cfg = FilterConfig(trimming=0, deduplication=True)
    filter_stage.filter_reads(cfg, fq1, o1, fq2, o2)
    assert _same(r1, o1)
    assert _same(r2, o2)


def test_pe_everything_bitwise(pe_fastq, tmp_path):
    """All knobs at once: region trim + dedup + truncation budget."""
    fq1, fq2 = pe_fastq
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    o1, o2 = str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")
    _run_reference(["-1", fq1, "-2", fq2, "-3", r1, "-4", r2,
                    "-d", "-s", "3", "-e", "88", "-t", "15000"])
    cfg = FilterConfig(trimming=15000 / 1e9, deduplication=True,
                       keep_region=(3, 88))
    filter_stage.filter_reads(cfg, fq1, o1, fq2, o2)
    assert _same(r1, o1)
    assert _same(r2, o2)


def test_pe_small_batches_cross_budget(pe_fastq, tmp_path):
    """The budget must carry across device batches exactly."""
    fq1, fq2 = pe_fastq
    r1, r2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    o1, o2 = str(tmp_path / "o1.fq"), str(tmp_path / "o2.fq")
    _run_reference(["-1", fq1, "-2", fq2, "-3", r1, "-4", r2, "-t", "40000"])
    cfg = FilterConfig(trimming=40000 / 1e9, batch_reads=64)
    filter_stage.filter_reads(cfg, fq1, o1, fq2, o2)
    assert _same(r1, o1)
    assert _same(r2, o2)

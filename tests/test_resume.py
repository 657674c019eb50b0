import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests import profile_fixture, synth


def _run_cli(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", "mitoflex_tpu", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900,
    )


def test_all_resume_skips_completed_stages(tmp_path):
    rng = np.random.default_rng(55)
    fake = profile_fixture.build(tmp_path, rng)
    comp = str.maketrans("ACGT", "TGCA")
    pairs = []
    g2 = fake.genome + fake.genome[:400]
    for _ in range(1200):
        s = rng.integers(0, len(g2) - 300)
        frag = g2[s : s + 300]
        pairs.append((frag[:100], frag[-100:].translate(comp)[::-1]))
    f1 = synth.write_fastq(tmp_path / "r1.fq", [(a, "I" * 100) for a, _ in pairs])
    f2 = synth.write_fastq(tmp_path / "r2.fq", [(b, "I" * 100) for _, b in pairs])
    common = [
        "all", "--fastq1", f1, "--fastq2", f2, "--workname", "res",
        "--clade", fake.clade, "--profile-dir", fake.profile_dir,
        "--kmer-list", "21,41", "--depth-list", "5,5", "--min-abundance", "10",
        "--disable-taxa", "--keep-temp", "--genetic-code", "5",
        "--disable-visualization",
    ]
    r = _run_cli(common, str(tmp_path))
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-2000:]

    # reference stage artifacts exist
    fdir = tmp_path / "res" / "res.temp" / "findmitoscaf"
    assert (fdir / "res.hmm.filtered.fa").exists()
    assert (fdir / "res.abundance.high.fa").exists()
    assert (fdir / "res.candidates.json").exists()
    adir = tmp_path / "res" / "res.temp" / "annotation"
    assert (adir / "res.wise.csv").exists()

    # delete the raw input: resume must not need it before findmitoscaf
    r2 = _run_cli(common + ["--resume"], str(tmp_path))
    assert r2.returncode == 0, r2.stdout[-1500:] + r2.stderr[-2000:]
    assert "resume: skipping cleandata" in open(tmp_path / "res" / "res.log").read()

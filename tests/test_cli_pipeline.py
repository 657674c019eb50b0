import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mitoflex_tpu.io import encoding, fasta
from tests import profile_fixture, synth


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic raw PE dataset: circular fake mitogenome at high depth +
    nuclear background at low depth + junk reads."""
    rng = np.random.default_rng(77)
    base = tmp_path_factory.mktemp("ds")
    fake = profile_fixture.build(base, rng)
    comp = str.maketrans("ACGT", "TGCA")
    nuclear = synth.random_genome(rng, 3500)

    def pe(g, n, circ):
        g2 = g + g[:400] if circ else g
        out = []
        for _ in range(n):
            s = rng.integers(0, len(g2) - 300)
            frag = g2[s : s + 300]
            out.append((frag[:100], frag[-100:].translate(comp)[::-1]))
        return out

    pairs = pe(fake.genome, 1400, True) + pe(nuclear, 260, False)
    junk = [("N" * 100, "N" * 100)] * 20
    f1, f2 = str(base / "r1.fq"), str(base / "r2.fq")
    with open(f1, "w") as a, open(f2, "w") as b:
        for i, (x, y) in enumerate(pairs + junk):
            q = "I" * 100 if i < len(pairs) else "#" * 100
            a.write(f"@p{i}/1\n{x}\n+\n{q}\n")
            b.write(f"@p{i}/2\n{y}\n+\n{q}\n")
    return fake, f1, f2, str(base)


def _run_cli(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    return subprocess.run(
        [sys.executable, "-m", "mitoflex_tpu", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900,
    )


def test_cli_load_modules(tmp_path):
    r = _run_cli(["load_modules"], str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "All modules loaded." in r.stdout


def test_cli_generate_config(tmp_path):
    r = _run_cli(["all", "--fastq1", "x.fq", "--clade", "Testa",
                  "--kmer-list", "21,41", "--generate-config", "conf.py"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    text = open(tmp_path / "conf.py").read()
    assert "'clade': 'Testa'" in text
    assert "[21, 41]" in text


def test_cli_filter_flag_parity(tmp_path):
    """Reference spellings --Ns-valve / --keep-region / --cleanq1 are
    accepted (arguments.py fastq+filter groups, MitoFlex.py:81-88)."""
    r = _run_cli(["filter", "--fastq1", "x.fq", "--Ns-valve", "7",
                  "--keep-region", "5,90", "--cleanq1", "mine.1.fq",
                  "--generate-config", "conf.py"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    text = open(tmp_path / "conf.py").read()
    assert "'ns_valve': 7" in text
    assert "'keep_region': (5, 90)" in text


def test_cli_rejects_bad_config(tmp_path):
    r = _run_cli(["all", "--fastq1", "x.fq", "--kmer-list", "20,40"], str(tmp_path))
    assert r.returncode == 2
    assert "odd" in r.stderr


def test_cli_all_end_to_end(dataset, tmp_path):
    fake, f1, f2, _ = dataset
    r = _run_cli(
        [
            "all", "--fastq1", f1, "--fastq2", f2,
            "--workname", "testrun",
            "--clade", fake.clade,
            "--profile-dir", fake.profile_dir,
            "--kmer-list", "21,41", "--depth-list", "5,5",
            "--min-abundance", "10",
            "--disable-taxa", "--keep-temp",
            "--genetic-code", "5",
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    result_dir = tmp_path / "testrun" / "testrun.result"
    picked = fasta.load_fasta(str(result_dir / "testrun.picked.fa"))
    assert len(picked) >= 1
    best = max(picked, key=lambda p: len(p.seq))
    dbl = fake.genome + fake.genome
    rc = encoding.revcomp_str(best.seq)
    assert best.seq in dbl or rc in dbl
    locs = json.load(open(result_dir / "locs.json"))
    pcgs = {g for g, v in locs.items() if v[2] == 0}
    assert pcgs >= set(profile_fixture.GENES)
    pngs = list(result_dir.glob("*.png"))
    assert pngs and pngs[0].stat().st_size > 10000
    # log file written
    assert (tmp_path / "testrun" / "testrun.log").exists()


def test_scaffold_joins_contigs(tmp_path, rng):
    from mitoflex_tpu.config import AssembleConfig
    from mitoflex_tpu.stages.scaffold import scaffold_contigs

    g = synth.random_genome(rng, 4000)
    # two contigs with a 150 bp unassembled gap
    c1, c2 = g[:1900], g[2050:]
    contigs = str(tmp_path / "contigs.fa")
    fasta.write_fasta(
        [fasta.FastaRecord("c1", c1, {"flag": 0, "multi": 40, "len": len(c1)}),
         fasta.FastaRecord("c2", c2, {"flag": 0, "multi": 40, "len": len(c2)})],
        contigs,
    )
    pairs = synth.shotgun_reads(rng, g, 1200, read_len=100, insert=300)
    f1 = synth.write_fastq(tmp_path / "s1.fq", [p[0] for p in pairs])
    f2 = synth.write_fastq(tmp_path / "s2.fq", [p[1] for p in pairs])
    out = str(tmp_path / "scaffolds.fa")
    scaffold_contigs(AssembleConfig(insert_size=300), contigs, f1, f2, out)
    scaffolds = fasta.load_fasta(out)
    assert len(scaffolds) == 1
    s = scaffolds[0]
    assert s.id.startswith("scaffold_")
    assert s.multi == 32767
    assert len(s.seq) >= 3900
    # both contig sequences present in order (possibly rc of whole)
    fwd = s.seq
    rc = encoding.revcomp_str(s.seq)
    assert (c1 in fwd and c2 in fwd) or (
        encoding.revcomp_str(c1) in rc or c1 in rc
    )


def test_findmitoscaf_standalone_length_gate(tmp_path, rng, monkeypatch):
    """Standalone findmitoscaf entry gates contigs by min/max length BEFORE
    the remap (reference fastfilter -l min,max -d 0, MitoFlex.py:146-152),
    swaps fq2 into fq1 when only fq2 is given, and refuses to run with no
    reads at all (MitoFlex.py:153-157)."""
    from mitoflex_tpu import pipeline
    from mitoflex_tpu.config import PipelineConfig
    from mitoflex_tpu.stages import findmitoscaf as fms
    from mitoflex_tpu.utils.workdir import WorkDir

    g = synth.random_genome(rng, 3000)
    records = [
        fasta.FastaRecord("mito", g),
        fasta.FastaRecord("short", g[:150]),          # < min_length (200)
        fasta.FastaRecord("long", synth.random_genome(rng, 25000)),  # > max
    ]
    contigs = str(tmp_path / "raw.fa")
    fasta.write_fasta(records, contigs)
    reads = synth.shotgun_reads(rng, g, 300, read_len=100, insert=300)
    fq = synth.write_fastq(tmp_path / "reads.fq", [p[0] for p in reads])

    seen = {}

    def fake_stage(cfg, recs, *a, **kw):
        seen["records"] = recs
        return fms.FindMitoResult(
            picked=list(recs), hmm_frame=None, selected_candidates={},
            found_pcgs=[], missing_pcgs=[])

    monkeypatch.setattr(fms, "findmitoscaf", fake_stage)
    cfg = PipelineConfig()
    ctx = pipeline.PipelineContext(cfg, WorkDir(str(tmp_path), "t").create())

    # only fastq2 given -> swapped into the remap slot like the reference
    pipeline.run_findmitoscaf(ctx, contigs, None, fq, from_megahit=False)
    ids = [r.id for r in seen["records"]]
    assert ids == ["mito"], ids
    assert seen["records"][0].multi > 0  # remap tagged a real depth

    with pytest.raises(RuntimeError, match="At least one fastq"):
        pipeline.run_findmitoscaf(ctx, contigs, None, None, from_megahit=False)


@pytest.mark.slow
def test_cli_all_end_to_end_errorful(tmp_path):
    """Full pipeline on ERRORFUL reads: 1% per-base errors at ~400x over
    the fixture mitogenome (the error-free e2e above can't tell whether
    assembly actually polishes to consensus). Asserts the picked contig
    matches the genome EXACTLY and every PCG still annotates."""
    rng = np.random.default_rng(9)
    fake = profile_fixture.build(tmp_path, rng)
    nuclear = synth.random_genome(rng, 3500)
    glen = len(fake.genome)
    pairs = synth.shotgun_reads(
        rng, fake.genome, glen * 400 // 200, read_len=100, insert=300,
        circular=True, error_rate=0.01,
    )
    pairs += synth.shotgun_reads(
        rng, nuclear, 3500 * 12 // 200, read_len=100, insert=300,
        error_rate=0.01,
    )
    order = rng.permutation(len(pairs))
    pairs = [pairs[i] for i in order]
    f1 = synth.write_fastq(tmp_path / "r1.fq", [p[0] for p in pairs])
    f2 = synth.write_fastq(tmp_path / "r2.fq", [p[1] for p in pairs])
    r = _run_cli(
        [
            "all", "--fastq1", f1, "--fastq2", f2,
            "--workname", "errrun",
            "--clade", fake.clade,
            "--profile-dir", fake.profile_dir,
            "--kmer-list", "21,41", "--depth-list", "10,20",
            "--min-abundance", "10",
            "--disable-taxa", "--keep-temp",
            "--genetic-code", "5",
        ],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    result_dir = tmp_path / "errrun" / "errrun.result"
    picked = fasta.load_fasta(str(result_dir / "errrun.picked.fa"))
    assert len(picked) >= 1
    best = max(picked, key=lambda p: len(p.seq))
    dbl = fake.genome + fake.genome
    rc = encoding.revcomp_str(best.seq)
    assert best.seq in dbl or rc in dbl, "consensus not error-free"
    locs = json.load(open(result_dir / "locs.json"))
    pcgs = {g for g, v in locs.items() if v[2] == 0}
    assert pcgs >= set(profile_fixture.GENES)

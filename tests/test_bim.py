import numpy as np
import pytest

from mitoflex_tpu.config import PipelineConfig
from mitoflex_tpu.io import encoding, fasta
from mitoflex_tpu.pipeline import PipelineContext, run_bim
from tests import profile_fixture, synth


def test_bim_loop_converges(tmp_path, rng):
    """bim: bait loop filters reads down to the mito subset and keeps
    assembling it; with iteration_ignore=0 the first generation already
    runs findmitoscaf and returns the picked scaffold."""
    fake = profile_fixture.build(tmp_path, rng)
    comp = str.maketrans("ACGT", "TGCA")
    nuclear = synth.random_genome(rng, 2500)

    def pe(g, n, circ):
        g2 = g + g[:400] if circ else g
        out = []
        for _ in range(n):
            s = rng.integers(0, len(g2) - 300)
            frag = g2[s : s + 300]
            out.append((frag[:100], frag[-100:].translate(comp)[::-1]))
        return out

    pairs = pe(fake.genome, 1200, True) + pe(nuclear, 200, False)
    f1 = synth.write_fastq(tmp_path / "b1.fq", [(p[0], "I" * len(p[0])) for p in pairs])
    f2 = synth.write_fastq(tmp_path / "b2.fq", [(p[1], "I" * len(p[1])) for p in pairs])

    cfg = PipelineConfig.from_dict({
        "run": {"workname": "bimrun", "basedir": str(tmp_path),
                "profile_dir": fake.profile_dir},
        "filter": {"batch_reads": 1024, "max_read_len": 128},
        "assemble": {"kmer_list": [21, 41], "depth_list": [5, 5], "min_multi": 3,
                     "prune_depth": 2, "prune_level": 2,
                     "disable_scaffolding": True},
        "search": {"min_abundance": 10, "merge_method": 2, "disable_taxa": True},
        "annotate": {"clade": fake.clade, "genetic_code": 5},
        "bim": {"max_iteration": 3, "iteration_ignore": 0},
    })
    ctx = PipelineContext.create(cfg)
    picked_path = run_bim(ctx, f1, str(f2))
    picked = fasta.load_fasta(picked_path)
    assert picked
    best = max(picked, key=lambda p: len(p.seq))
    dbl = fake.genome + fake.genome
    assert best.seq in dbl or encoding.revcomp_str(best.seq) in dbl
    assert len(best.seq) > len(fake.genome) - 50

"""Golden-output regression tests (SURVEY.md §4): the pipeline's data
contracts are plain files, so outputs for a fixed seeded fixture are locked
as goldens. Any unintended behavior change in the search/annotation stack
shows up as a coordinate diff here."""

import json
import os

import numpy as np
import pytest

from mitoflex_tpu.config import AnnotateConfig, SearchConfig
from mitoflex_tpu.io.fasta import FastaRecord
from mitoflex_tpu.models.profiles import ProfileSet
from mitoflex_tpu.stages import annotate as ann
from mitoflex_tpu.stages import findmitoscaf as fms
from tests import profile_fixture

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "locs.fixture23.json")


@pytest.fixture(scope="module")
def fake(tmp_path_factory):
    rng = np.random.default_rng(23)  # same seed as the golden was built with
    return profile_fixture.build(tmp_path_factory.mktemp("prof"), rng)


def _annotate(fake):
    profiles = ProfileSet(fake.profile_dir)
    rec = FastaRecord("mito", fake.genome, {"flag": 0, "multi": 100,
                                            "len": len(fake.genome)})
    cfg = AnnotateConfig(clade=fake.clade, use_hmmer=False)
    res = ann.annotate(cfg, [rec], profiles, fake.clade, gene_code=5)
    return {g: list(v) for g, v in res.locs.items() if v[2] == 0}


def test_locs_match_golden(fake):
    got = _annotate(fake)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip("golden created; rerun to compare")
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_picked_set_is_stable(fake):
    profiles = ProfileSet(fake.profile_dir)
    mito = FastaRecord("mito", fake.genome, {"flag": 0, "multi": 120,
                                             "len": len(fake.genome)})
    cfg = SearchConfig(min_abundance=10, merge_method=2, disable_taxa=True)
    res = fms.findmitoscaf(cfg, [mito], profiles, fake.clade,
                           taxonomy=None, gene_code=5)
    assert [p.id for p in res.picked] == ["mito"]
    assert res.found_pcgs == profile_fixture.GENES  # deterministic order

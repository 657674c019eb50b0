import os

import pytest

from mitoflex_tpu.config import PipelineConfig, generate_config, load_config_file
from mitoflex_tpu.utils import seq as seqcodec
from mitoflex_tpu.utils.workdir import WorkDir


def test_seq_codec_roundtrip():
    d = seqcodec.decompile("k141_12 flag=1 multi=123.5 len=4567")
    assert d[""] == "k141_12"
    assert d["flag"] == 1 and d["multi"] == 123.5 and d["len"] == 4567
    s = seqcodec.compile_seq(d, "k141_12")
    assert seqcodec.decompile(s) == d


def test_contig_header():
    h = seqcodec.contig_header("c1", 1, 32767.0, 16000)
    cid, flag, multi, length = seqcodec.parse_contig_header(h)
    assert (cid, flag, multi, length) == ("c1", 1, 32767.0, 16000)


def test_config_defaults_match_reference():
    cfg = PipelineConfig()
    assert cfg.assemble.kmer_list == [31, 39, 59, 79, 99, 119, 141]
    assert cfg.assemble.depth_list == [10, 20, 20, 50, 50, 70, 70]
    assert cfg.filter.quality_valve == 55 and cfg.filter.percentage_valve == 0.2
    assert cfg.search.full_ratio == 0.95
    assert cfg.annotate.overlap_ratio == 0.2
    assert not cfg.validate()


def test_config_rejects_unknown_key():
    with pytest.raises(KeyError):
        PipelineConfig.from_dict({"assemble": {"addtional_check": True}})


def test_config_validation_catches_even_kmer():
    cfg = PipelineConfig.from_dict({"assemble": {"kmer_list": "30,41", "depth_list": "1,2"}})
    assert any("odd" in p for p in cfg.validate())


def test_config_file_roundtrip(tmp_path):
    cfg = PipelineConfig()
    cfg.annotate.clade = "Annelida"
    cfg.assemble.kmer_list = [21, 33]
    cfg.assemble.depth_list = [5, 10]
    path = tmp_path / "conf.py"
    generate_config(cfg, str(path))
    cfg2 = load_config_file(str(path))
    assert cfg2.annotate.clade == "Annelida"
    assert cfg2.assemble.kmer_list == [21, 33]


def test_workdir_layout(tmp_path):
    wd = WorkDir(str(tmp_path), "job").create()
    assert os.path.isdir(wd.stage_dir("assemble"))
    assert os.path.isdir(wd.result)
    wd.write_manifest("assemble", {"outputs": [wd.stage_file("assemble", "x.fa")]})
    assert not wd.stage_complete("assemble")
    open(wd.stage_file("assemble", "x.fa"), "w").close()
    assert wd.stage_complete("assemble")

import numpy as np

from mitoflex_tpu.parallel import distributed as dist
from tests import synth


def test_host_file_range_covers_all_records(tmp_path, rng):
    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 3000), 400, read_len=90)
    p = synth.write_fastq(tmp_path / "r.fq", reads)
    n_hosts = 4
    ranges = [dist.host_file_range(str(p), i, n_hosts) for i in range(n_hosts)]
    # contiguous, non-overlapping, full coverage
    assert ranges[0][0] == 0
    import os

    assert ranges[-1][1] == os.path.getsize(p)
    total_records = 0
    for (start, end) in ranges:
        with open(p, "rb") as f:
            f.seek(start)
            data = f.read(end - start)
        lines = data.split(b"\n")
        recs = sum(1 for i in range(0, len(lines) - 3, 4) if lines[i].startswith(b"@"))
        total_records += recs
    assert total_records == 400
    # boundaries align: each range starts with a record header
    for (start, end) in ranges:
        if start == 0 or start >= end:
            continue
        with open(p, "rb") as f:
            f.seek(start)
            assert f.readline().startswith(b"@")


def test_init_distributed_single_process():
    assert dist.init_distributed() == (0, 1)


def test_filter_stage_with_mesh(tmp_path, rng):
    import jax

    from mitoflex_tpu.config import FilterConfig
    from mitoflex_tpu.parallel.mesh import make_mesh
    from mitoflex_tpu.stages.filter import filter_reads

    reads = synth.shotgun_reads(rng, synth.random_genome(rng, 2000), 200, read_len=100)
    bad = [("N" * 100, "I" * 100)] * 8
    p = synth.write_fastq(tmp_path / "in.fq", reads + bad)
    mesh = make_mesh((8,), ("data",))
    cfg = FilterConfig(batch_reads=128, max_read_len=128)
    res = filter_reads(cfg, p, str(tmp_path / "c.fq"), mesh=mesh)
    assert res.reads_in == 208
    assert res.reads_kept == 200

"""Contig depth/length gate vs the reference `fastfilter` binary.

The reference vendors the compiled Rust contig filter
(assemble/fastfilter_src/src/main.rs). Its length check uses
``seq.len() - 1`` (main.rs:97), so the binary keeps len in
[min+1, max+1]; our `filter_contigs` keeps len in [min, max] — the
intended window per the wrapper contract (assemble_wrapper.py:318-345).
The golden comparison therefore calls ours with (min+1, max+1): this
pins the depth-gate float semantics (f32 `multi=` parse, strict
`d > depth` drop) and the overall keep set, while making the
off-by-one quirk explicit. The `-m` top-N mode is not compared: its
sort key is the unit type `()` (main.rs:119-125), i.e. it returns the
last N records reversed — a documented reference bug our ranked
fallback deliberately fixes (SURVEY.md §7 known quirks).
"""

import os
import subprocess

import numpy as np
import pytest

from mitoflex_tpu.stages.assemble import Contig, filter_contigs

FASTFILTER = "/root/reference/assemble/fastfilter"


def _binary_works() -> bool:
    if not (os.path.exists(FASTFILTER) and os.access(FASTFILTER, os.X_OK)):
        return False
    try:
        r = subprocess.run([FASTFILTER, "--version"], capture_output=True, timeout=30)
        return r.returncode == 0
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _binary_works(), reason="reference fastfilter binary unavailable"
)


def _make_contigs(rng, n=400):
    contigs = []
    for i in range(n):
        # lengths straddling the 200/20000 window incl. exact boundaries
        L = int(rng.choice([150, 199, 200, 201, 250, 1000, 5000,
                            19999, 20000, 20001, 25000]))
        depth = float(np.float32(rng.choice([0.5, 1.0, 2.9999, 3.0, 3.0001,
                                             7.25, 12.5, 100.0, 32767.0])))
        seq = "".join(rng.choice(list("ACGT"), size=L))
        contigs.append((f"k79_{i}", Contig(seq=seq, depth=depth, circular=False)))
    return contigs


def _write_oneline(contigs, path):
    with open(path, "w") as f:
        for name, c in contigs:
            f.write(f">{name} flag=1 multi={c.depth} len={len(c.seq)}\n{c.seq}\n")


def _ref_kept_ids(path_in, path_out, min_len, max_len, depth):
    subprocess.run(
        [FASTFILTER, "-i", path_in, "-o", path_out,
         "-l", f"{min_len},{max_len}", "-d", str(depth)],
        check=True, capture_output=True, timeout=60,
    )
    ids = []
    with open(path_out) as f:
        for line in f:
            if line.startswith(">"):
                ids.append(line[1:].split()[0])
    return ids


@pytest.mark.parametrize("depth", [0, 3, 10])
def test_keep_set_matches_binary(tmp_path, depth):
    rng = np.random.default_rng(5)
    contigs = _make_contigs(rng)
    fa_in = str(tmp_path / "in.fa")
    fa_out = str(tmp_path / "out.fa")
    _write_oneline(contigs, fa_in)
    ref_ids = _ref_kept_ids(fa_in, fa_out, 200, 20000, depth)
    # +1 on both bounds compensates the binary's `seq.len() - 1` quirk
    ours = filter_contigs([c for _, c in contigs], min_depth=depth,
                          min_length=201, max_length=20001)
    our_ids = [name for name, c in contigs if c in ours]
    assert our_ids == ref_ids


def test_fractional_depth_gate(tmp_path):
    """multi= values just below the integer gate must drop (f32 compare)."""
    rng = np.random.default_rng(6)
    contigs = [
        ("a", Contig("A" * 300, 2.9999995, False)),   # rounds to < 3 in f32
        ("b", Contig("C" * 300, 3.0, False)),
        ("c", Contig("G" * 300, 2.5, False)),
        ("d", Contig("T" * 300, 3.0000002, False)),
    ]
    fa_in = str(tmp_path / "in.fa")
    fa_out = str(tmp_path / "out.fa")
    _write_oneline(contigs, fa_in)
    ref_ids = _ref_kept_ids(fa_in, fa_out, 100, 1000, 3)
    ours = filter_contigs([c for _, c in contigs], 3, 101, 1001)
    our_ids = [name for name, c in contigs if c in ours]
    assert our_ids == ref_ids
    del rng

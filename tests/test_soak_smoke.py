"""Tiny-scale smoke of the soak bench child (scripts/soakbench.py via
bench.py --child-soak): the production count -> gate -> graph path runs,
emits the JSON contract, and recovers the mitogenome through the depth
gate. Protects the driver-visible bench extras from bitrot."""

import json
import os
import subprocess
import sys


def test_soak_child_smoke():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        MITOFLEX_SOAK_MBP="0.2",
        MITOFLEX_SOAK_DEPTH="12",
        MITOFLEX_SOAK_MITO_DEPTH="120",
        MITOFLEX_SOAK_CHUNK="8192",
        PYTHONPATH="/root/repo",
    )
    r = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "bench.py"), "--child-soak"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.strip().startswith("{")][-1]
    out = json.loads(line)
    assert out["backend"] == "cpu"
    assert out["soak_gbp"] > 0
    assert out["soak_count_wall_s"] >= 0
    assert out["soak_solid_edges_m"] > 0
    assert out["soak_mito_recovered"] is True, out

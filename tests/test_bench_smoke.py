"""Tiny CPU end-to-end runs of standalone scale benches.

The scale benches drive engine internals directly (their corpora are
generated on device to avoid benching the upload path), so engine
signature drift can strand them without any suite failure — the IVF
bench broke exactly that way in r3 (see tests/test_ivf.py::
TestBenchScriptRunnable), and scale10m_bench later broke at tiny row
counts because its chunked two-pass generator assumed rows >= CHUNK.
One fast subprocess run per script keeps them honest.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env=None):
    full_env = dict(os.environ, JAX_PLATFORMS="cpu", **(env or {}))
    out = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True,
        timeout=300, cwd=REPO, env=full_env)
    assert out.returncode == 0, out.stdout + out.stderr
    return [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{")]


class TestScale10MBenchRunnable:
    def test_tiny_cpu(self):
        lines = _run(
            ["benches/scale10m_bench.py", "--rows", "2048", "--cpu",
             "--skip-host-leg"],
            env={"SCALE10M_CHUNK": "1024", "SCALE10M_ROUNDS": "1"})
        metrics = {m["metric"]: m for m in lines}
        assert any("batch 64" in m for m in metrics), metrics
        recalls = [m["value"] for m in lines
                   if m["metric"].startswith("10M-scale recall")]
        # exact re-rank over a 2k corpus must be perfect
        assert recalls and all(r == 1.0 for r in recalls), lines

"""Real multi-process `jax.distributed` coverage (SURVEY §5 distributed row).

Runs tools/smoke_distributed.py — a localhost coordinator + 2 CPU worker
processes (4 virtual devices each) executing one dp train step over the
8-device GLOBAL mesh — as a subprocess, because the distributed runtime can
only initialize once per process and the suite's own backend is already up.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_smoke(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "smoke_distributed.py")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site",
             "MSLA_SMOKE_LOG": str(tmp_path / "smoke.log")})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "verdict: PASS" in proc.stdout
    assert "losses bit-identical across ranks: True" in proc.stdout

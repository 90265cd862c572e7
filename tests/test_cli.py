"""CLI integration test: `python main.py debug=default train_vqvae=True`
runs the composed pipeline end-to-end in a subprocess on fixture WAVs."""
import os
import subprocess
import sys
from pathlib import Path

import pytest

from msla_tpu.data.dataset import make_fixture_dataset

REPO = Path(__file__).resolve().parents[1]
SR = 4000


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("slakh_cli")
    for split, n in [("train", 2), ("validation", 2), ("test", 1)]:
        make_fixture_dataset(root / split, n_tracks=n, seconds=26, sr=SR)
    return root


def test_cli_debug_vqvae(fixture_root, tmp_path):
    env = dict(os.environ)
    env.update(SLAKH_DIR=str(fixture_root), PROJECT_ROOT=str(tmp_path),
               JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, str(REPO / "main.py"), "debug=default", "train_vqvae=True",
         f"data.target_sample_rate={SR}", "data.batch_size=2"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=420)
    assert result.returncode == 0, result.stderr[-2000:]
    # debug suppresses checkpointing → generate/visualize log their skip
    out = result.stdout + result.stderr
    assert "generate: skipping" in out
    # a debug run dir with the task log exists under the temp PROJECT_ROOT
    assert list((tmp_path / "logs" / "debug" / "runs").glob("*/debug.log"))

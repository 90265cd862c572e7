"""RankedLogger + instantiators (reference: src/utils/pylogger.py:9-51,
src/utils/instantiators.py:11-50).

The backend-safety test is the important one: `_current_rank()` is called
from every log line, so it must NEVER initialize a jax backend — on the
single-client axon TPU tunnel a backend init claims the chip (CLAUDE.md
"Environment traps"). That property only holds in a process where no backend
exists yet, so it runs in a subprocess.
"""
from __future__ import annotations

import logging
import subprocess
import sys

import pytest

from msla_tpu.config import ConfigNode
from msla_tpu.utils import pylogger
from msla_tpu.utils.instantiators import instantiate_callbacks, instantiate_loggers
from msla_tpu.utils.pylogger import RankedLogger


def test_current_rank_does_not_initialize_backend():
    # Fresh interpreter: no jax backend exists. _current_rank() must consult
    # only the env fallback and leave xla_bridge._backends empty afterwards.
    code = (
        "from msla_tpu.utils.pylogger import _current_rank, RankedLogger\n"
        "import logging, os\n"
        "os.environ['JAX_PROCESS_INDEX'] = '3'\n"
        "assert _current_rank() == 3, _current_rank()\n"
        "log = RankedLogger('t', rank_zero_only=True)\n"
        "log.logger.setLevel(logging.INFO)\n"
        "log.info('hello')  # suppressed (rank 3), must not touch a backend\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, xla_bridge._backends\n"
        "print('NO_BACKEND_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert "NO_BACKEND_OK" in out.stdout


def test_rank_zero_only_suppresses_nonzero_rank(monkeypatch, caplog):
    log = RankedLogger("test_rzo", rank_zero_only=True)
    log.logger.setLevel(logging.INFO)
    monkeypatch.setattr(pylogger, "_current_rank", lambda: 1)
    with caplog.at_level(logging.INFO, logger="test_rzo"):
        log.info("should not appear")
    assert not caplog.records

    monkeypatch.setattr(pylogger, "_current_rank", lambda: 0)
    with caplog.at_level(logging.INFO, logger="test_rzo"):
        log.info("visible")
    assert len(caplog.records) == 1
    # rank prefix matches the reference's f"[rank: {current_rank}]" format
    assert caplog.records[0].getMessage() == "[rank: 0] visible"


def test_targeted_rank_logging(monkeypatch, caplog):
    log = RankedLogger("test_target", rank_zero_only=False)
    log.logger.setLevel(logging.INFO)
    monkeypatch.setattr(pylogger, "_current_rank", lambda: 2)
    with caplog.at_level(logging.INFO, logger="test_target"):
        log.log(logging.INFO, "only rank 1", rank=1)   # not us -> dropped
        log.log(logging.INFO, "only rank 2", rank=2)   # us -> logged
        log.log(logging.INFO, "all ranks")             # rank=None -> logged
    msgs = [r.getMessage() for r in caplog.records]
    assert msgs == ["[rank: 2] only rank 2", "[rank: 2] all ranks"]


def test_instantiate_callbacks_from_config_tree():
    cfg = ConfigNode({
        "model_checkpoint": {
            "_target_": "msla_tpu.train.callbacks.ModelCheckpoint",
            "dirpath": "/tmp/pylogger_cb", "monitor": "val/loss",
        },
        "not_a_callback": {"some": "value"},  # no _target_ -> skipped
    })
    cbs = instantiate_callbacks(cfg)
    assert len(cbs) == 1
    assert type(cbs[0]).__name__ == "ModelCheckpoint"
    assert instantiate_callbacks(None) == []
    with pytest.raises(TypeError):
        instantiate_callbacks({"raw": "dict"})


def test_instantiate_loggers_from_config_tree(tmp_path):
    cfg = ConfigNode({
        "csv": {"_target_": "msla_tpu.train.loggers.CSVLogger",
                "save_dir": str(tmp_path), "name": "csv"},
    })
    lgs = instantiate_loggers(cfg)
    assert len(lgs) == 1
    assert type(lgs[0]).__name__ == "CSVLogger"
    assert instantiate_loggers(None) == []
    with pytest.raises(TypeError):
        instantiate_loggers(["not", "a", "node"])

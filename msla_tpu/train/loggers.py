"""Metric/artifact loggers (reference: configs/logger/{wandb,tensorboard}.yaml,
lightning loggers used in src/main.py:33,77,128).

All loggers implement the same small interface: log_metrics / log_hyperparams
/ log_audio / log_table / finalize. WandbLogger degrades to an offline JSONL
stub when the wandb package is unavailable (it is not baked into this image),
keeping the audio-demo-table code path exercisable.
"""
from __future__ import annotations

import csv
import json
import logging
import os
from pathlib import Path
from typing import Any, Mapping

import numpy as np

log = logging.getLogger(__name__)


class Logger:
    """Base logger interface."""

    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        raise NotImplementedError

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        pass

    def log_audio(self, key: str, audio: np.ndarray, sample_rate: int, step: int) -> None:
        pass

    def log_table(self, key: str, columns: list[str], data: list[list[Any]]) -> None:
        pass

    def finalize(self, status: str = "success") -> None:
        pass


class TensorBoardLogger(Logger):
    """TensorBoard backend via tensorboardX (reference: configs/logger/tensorboard.yaml)."""

    def __init__(self, save_dir: str, name: str | None = None, log_graph: bool = False,
                 default_hp_metric: bool = True, prefix: str = ""):
        from tensorboardX import SummaryWriter

        logdir = Path(save_dir) / (name or "")
        logdir.mkdir(parents=True, exist_ok=True)
        self._writer = SummaryWriter(logdir=str(logdir))
        self._prefix = prefix

    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        for key, value in metrics.items():
            self._writer.add_scalar(self._prefix + key, float(value), step)

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        self._writer.add_text("hparams", json.dumps(dict(params), default=str, indent=2))

    def log_audio(self, key: str, audio: np.ndarray, sample_rate: int, step: int) -> None:
        try:
            self._writer.add_audio(key, np.asarray(audio).reshape(-1, 1), step,
                                   sample_rate=sample_rate)
        except Exception:
            # tensorboardX's audio encoder needs soundfile (absent here) —
            # persist the clip next to the event files instead
            from msla_tpu.data.wavio import write_wav

            out = Path(self._writer.logdir) / "audio"
            out.mkdir(parents=True, exist_ok=True)
            safe = key.replace("/", "_").replace(" ", "_")
            write_wav(out / f"{safe}_step{step}.wav", np.asarray(audio), sample_rate)

    def finalize(self, status: str = "success") -> None:
        self._writer.close()


class CSVLogger(Logger):
    """Append-only CSV metrics log."""

    def __init__(self, save_dir: str, name: str | None = None, prefix: str = ""):
        logdir = Path(save_dir) / (name or "")
        logdir.mkdir(parents=True, exist_ok=True)
        self._path = logdir / "metrics.csv"
        self._prefix = prefix
        self._fields: list[str] = []
        if self._path.exists():  # adopt the schema of an earlier stage's log
            with open(self._path) as f:
                header = f.readline().strip()
            if header:
                self._fields = header.split(",")

    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        row = {"step": step}
        row.update({self._prefix + k: float(v) for k, v in metrics.items()})
        new_fields = [f for f in row if f not in self._fields]
        if new_fields:  # rewrite header when the schema grows
            self._fields += new_fields
            rows = []
            if self._path.exists():
                with open(self._path) as f:
                    rows = list(csv.DictReader(f))
            with open(self._path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._fields)
                writer.writeheader()
                for r in rows:
                    writer.writerow(r)
        with open(self._path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._fields).writerow(row)


class WandbLogger(Logger):
    """W&B surface (reference: configs/logger/wandb.yaml). Falls back to an
    offline JSONL stub when the wandb package is missing."""

    def __init__(self, name: str = None, project: str = None, save_dir: str = ".",
                 log_model: bool = False, offline: bool = False, version: str = None,
                 settings: Mapping | None = None):
        self._save_dir = Path(save_dir)
        self._save_dir.mkdir(parents=True, exist_ok=True)
        self._run = None
        try:
            import wandb  # noqa: F401 — not baked into this image

            kwargs = dict(name=name, project=project, dir=str(save_dir),
                          mode="offline" if offline else "online", id=version)
            self._wandb = wandb
            self._run = wandb.init(**{k: v for k, v in kwargs.items() if v is not None})
        except Exception:
            self._wandb = None
            self._jsonl = self._save_dir / "wandb_stub.jsonl"
            log.info("wandb unavailable — logging to %s", self._jsonl)

    def _emit(self, record: dict) -> None:
        with open(self._jsonl, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        if self._wandb:
            self._wandb.log(dict(metrics), step=step)
        else:
            self._emit({"type": "metrics", "step": step,
                        "data": {k: float(v) for k, v in metrics.items()}})

    def log_hyperparams(self, params: Mapping[str, Any]) -> None:
        if self._wandb and self._run:
            self._run.config.update(dict(params), allow_val_change=True)
        elif not self._wandb:
            self._emit({"type": "hparams", "data": dict(params)})

    def log_table(self, key: str, columns: list[str], data: list[list[Any]]) -> None:
        if self._wandb:
            self._wandb.log({key: self._wandb.Table(columns=columns, data=data)})
        else:
            self._emit({"type": "table", "key": key, "columns": columns,
                        "data": [[str(c) for c in row] for row in data]})

    def log_audio(self, key: str, audio: np.ndarray, sample_rate: int, step: int) -> None:
        if self._wandb:
            self._wandb.log({key: self._wandb.Audio(np.asarray(audio), sample_rate=sample_rate)},
                            step=step)
        else:
            self._emit({"type": "audio", "key": key, "step": step,
                        "samples": int(np.asarray(audio).size), "sample_rate": sample_rate})

    def finalize(self, status: str = "success") -> None:
        if self._wandb and self._run:
            self._run.finish(exit_code=0 if status == "success" else 1)

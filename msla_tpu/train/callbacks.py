"""Training callbacks: ModelCheckpoint + EarlyStopping
(reference: configs/callbacks/{model_checkpoint,early_stopping}.yaml and
Lightning's implementations they configure).

Semantics preserved: monitor `validation/loss`, top-k best files named
`<filename>.ckpt`, `-v1.ckpt`, ... (best is always `<filename>.ckpt` so the
cross-stage hard-coded path `best_vqvae.ckpt` works — reference:
src/main.py:63), `last.ckpt` on every save, early stop on patience /
non-finite / thresholds.
"""
from __future__ import annotations

import logging
import math
import os
from pathlib import Path
from typing import Mapping

from msla_tpu.parallel.mesh import is_main_process

log = logging.getLogger(__name__)


class Callback:
    def on_validation_end(self, trainer, metrics: Mapping[str, float]) -> None:
        pass

    def on_train_end(self, trainer) -> None:
        pass

    @property
    def stop_training(self) -> bool:
        return False

    # Lightning checkpoints carry callback state (EarlyStopping wait count,
    # ModelCheckpoint best-k heap) so resume continues where it left off
    # (reference: lightning Trainer.fit(ckpt_path=...) behind src/main.py:48).
    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


class ModelCheckpoint(Callback):
    def __init__(self, dirpath: str, filename: str = "best", monitor: str = "validation/loss",
                 verbose: bool = False, save_last: bool = True, save_top_k: int = 2,
                 mode: str = "min", auto_insert_metric_name: bool = True,
                 save_weights_only: bool = False, every_n_train_steps=None,
                 train_time_interval=None, every_n_epochs=None,
                 save_on_train_epoch_end=None, wire: str | None = None,
                 wire_best: bool = False):
        self.dirpath = Path(dirpath)
        self.filename = filename
        self.monitor = monitor
        self.verbose = verbose
        self.save_last = save_last
        self.save_top_k = save_top_k
        self.mode = mode
        self.save_weights_only = save_weights_only
        # wire ('bf16'/'q8'): on-device downcast of the fetched state for
        # last.ckpt — crash-resume checkpoints tolerate the approximation and
        # the device→host fetch dominates the inter-epoch stall on remote-
        # relay hosts. Best/versioned saves stay exact unless wire_best=True
        # (they feed cross-stage handoff and reverse export).
        self.wire = wire
        self.wire_best = wire_best
        # (auto_insert_metric_name / every_n_* accepted for config parity; the
        # reference never sets them to non-defaults)
        self._best: list[tuple[float, str]] = []  # [(score, versioned path)] best-first
        self._version = 0
        self.best_model_path: str | None = None
        self.best_model_score: float | None = None

    def state_dict(self) -> dict:
        return {"best": [[score, path] for score, path in self._best],
                "version": self._version,
                "best_model_path": self.best_model_path,
                "best_model_score": self.best_model_score}

    def load_state_dict(self, state: dict) -> None:
        # join in-flight background writes to the referenced files first —
        # versioned best saves are backgrounded, so a same-process restore
        # must not mistake a queued write for a missing file
        from msla_tpu.train.checkpoint import wait_for_pending

        for _, p in state.get("best", []):
            wait_for_pending(str(p))
        # drop heap entries whose files no longer exist (e.g. copied ckpt)
        self._best = [(float(s), str(p)) for s, p in state.get("best", [])
                      if os.path.exists(str(p))]
        self._version = int(state.get("version", len(self._best)))
        self.best_model_path = state.get("best_model_path") or None
        score = state.get("best_model_score")
        self.best_model_score = float(score) if score is not None else None

    def _qualifies(self, score: float) -> bool:
        if self.save_top_k == 0:   # Lightning: save nothing (last.ckpt only)
            return False
        if self.save_top_k < 0:    # Lightning: save everything
            return True
        if len(self._best) < self.save_top_k:
            return True
        worst = self._best[-1][0]
        return score < worst if self.mode == "min" else score > worst

    def on_validation_end(self, trainer, metrics: Mapping[str, float]) -> None:
        if self.monitor not in metrics:
            return
        score = float(metrics[self.monitor])
        # every rank keeps identical bookkeeping (_best/_version) so resume
        # state agrees, but only rank 0 touches the filesystem — the ckpt
        # writes inside trainer.save_checkpoint are rank-gated the same way
        main = is_main_process()
        if main:
            self.dirpath.mkdir(parents=True, exist_ok=True)

        if self.save_last:
            # background: last.ckpt has no hardlink consumers, so its
            # serialize+write (minutes for the multi-GB BERT state) overlaps
            # the next epoch; fit() joins pending writes before returning
            trainer.save_checkpoint(self.dirpath / "last.ckpt",
                                    weights_only=self.save_weights_only,
                                    background=True, wire=self.wire)

        if math.isnan(score) or not self._qualifies(score):
            return
        # top-k entries live in versioned files; the canonical
        # <filename>.ckpt is always (a copy of) the current best, so the
        # cross-stage hard-coded paths keep working. The versioned write is
        # backgrounded too (it is the OTHER multi-GB serialize of an improving
        # epoch) — the canonical hardlink is queued behind it on the ordered
        # write worker, so best_*.ckpt never points at a half-written file.
        from msla_tpu.train.checkpoint import link_after_pending, wait_for_pending

        path = str(self.dirpath / f"{self.filename}-v{self._version}.ckpt")
        self._version += 1
        # "off" (not None) when wire_best is unset: None would defer to the
        # blunt MSLA_CKPT_WIRE env opt-in and silently quantize the best
        # checkpoints that cross-stage handoff relies on staying bitwise-exact
        trainer.save_checkpoint(path, weights_only=self.save_weights_only,
                                background=True,
                                wire=self.wire if self.wire_best else "off")
        self._best.append((score, path))
        self._best.sort(key=lambda t: t[0], reverse=(self.mode == "max"))
        if self.save_top_k > 0:  # negative keeps everything
            while len(self._best) > self.save_top_k:
                _, drop = self._best.pop()
                if main:
                    wait_for_pending(drop)  # an in-flight write would resurrect it
                    if os.path.exists(drop):
                        os.remove(drop)

        canonical = str(self.dirpath / f"{self.filename}.ckpt")
        best_score, best_path = self._best[0]
        if main:
            link_after_pending(best_path, canonical)
        self.best_model_path = canonical
        self.best_model_score = best_score
        if self.verbose and main:
            log.info("Saved checkpoint %s (score %.6f)", path, score)


class EarlyStopping(Callback):
    def __init__(self, monitor: str = "validation/loss", min_delta: float = 0.0,
                 patience: int = 5, verbose: bool = False, mode: str = "min",
                 strict: bool = True, check_finite: bool = True,
                 stopping_threshold=None, divergence_threshold=None,
                 check_on_train_epoch_end=None):
        self.monitor = monitor
        self.min_delta = float(min_delta)
        self.patience = int(patience)
        self.verbose = verbose
        self.mode = mode
        self.strict = strict
        self.check_finite = check_finite
        self.stopping_threshold = stopping_threshold
        self.divergence_threshold = divergence_threshold
        self._wait = 0
        self._best: float | None = None
        self._stop = False

    def state_dict(self) -> dict:
        return {"wait": self._wait, "best": self._best, "stopped": self._stop}

    def load_state_dict(self, state: dict) -> None:
        self._wait = int(state.get("wait", 0))
        best = state.get("best")
        self._best = float(best) if best is not None else None
        self._stop = bool(state.get("stopped", False))

    @property
    def stop_training(self) -> bool:
        return self._stop

    def _improved(self, score: float) -> bool:
        if self._best is None:
            return True
        if self.mode == "min":
            return score < self._best - self.min_delta
        return score > self._best + self.min_delta

    def on_validation_end(self, trainer, metrics: Mapping[str, float]) -> None:
        if self.monitor not in metrics:
            if self.strict:
                raise RuntimeError(
                    f"EarlyStopping: monitored metric '{self.monitor}' not found in "
                    f"{sorted(metrics)}")
            return
        score = float(metrics[self.monitor])

        if self.check_finite and not math.isfinite(score):
            log.warning("EarlyStopping: %s is not finite (%s) — stopping", self.monitor, score)
            self._stop = True
            return
        if self.stopping_threshold is not None and (
                score <= self.stopping_threshold if self.mode == "min"
                else score >= self.stopping_threshold):
            self._stop = True
            return
        if self.divergence_threshold is not None and (
                score >= self.divergence_threshold if self.mode == "min"
                else score <= self.divergence_threshold):
            log.warning("EarlyStopping: %s diverged past %s", self.monitor,
                        self.divergence_threshold)
            self._stop = True
            return

        if self._improved(score):
            self._best = score
            self._wait = 0
        else:
            self._wait += 1
            if self._wait >= self.patience:
                if self.verbose:
                    log.info("EarlyStopping: no improvement in %d checks — stopping",
                             self.patience)
                self._stop = True

"""Hyper-parameter sweeper (reference: configs/hparams_search/optuna.yaml via
hydra's OptunaSweeper plugin; `python main.py -m hparams_search=optuna`).

Runs n_trials composed-config jobs, each in its own multirun subdirectory,
sampling overrides from the configured search space with the native
TPESampler, and minimizing/maximizing the value returned by the task
(``optimized_metric`` — reference: main.py:233-236). Trials run sequentially:
this host drives a single TPU, so `n_jobs` is accepted for config parity but
acts as 1 (concurrent trials would contend for the chip).
"""
from __future__ import annotations

import json
import logging
import math
from typing import Callable

import yaml

from msla_tpu.config import compose, instantiate, setup_job_logging, setup_run_dir
from msla_tpu.sweep.sampler import TPESampler
from msla_tpu.sweep.space import parse_space

log = logging.getLogger(__name__)


class TPESweeper:
    def __init__(self, params: dict | None = None, n_trials: int = 10, n_jobs: int = 1,
                 direction: str = "minimize", sampler: TPESampler | None = None,
                 storage=None, study_name: str | None = None):
        self.space = parse_space(dict(params or {}))
        self.n_trials = int(n_trials)
        self.n_jobs = int(n_jobs)  # parity only; execution is sequential
        self.direction = direction
        self.sampler = sampler or TPESampler()
        self.study_name = study_name
        self.observations: list[tuple[dict, float]] = []
        # `storage` plays optuna's study-persistence role
        # (reference configs/hparams_search/optuna.yaml:19-22): a JSONL trial
        # journal. Completed trials are appended as they finish and reloaded
        # on the next sweep with the same storage+study_name — they count
        # toward n_trials and seed the TPE sampler, so an interrupted sweep
        # resumes instead of restarting. Optuna RDB URLs are out of scope:
        # anything that is not a plain filesystem path fails loudly rather
        # than being silently ignored.
        self.storage = self._resolve_storage(storage)

    @staticmethod
    def _resolve_storage(storage):
        if storage is None:
            return None
        s = str(storage)
        if "://" in s:
            raise ValueError(
                f"storage={s!r}: RDB URLs are not supported — pass a "
                "filesystem path for the JSONL trial journal (or null)")
        from pathlib import Path

        return Path(s)

    def _load_journal(self) -> list[dict]:
        """Completed-trial records for THIS study from the storage journal."""
        if self.storage is None or not self.storage.exists():
            return []
        study = self.study_name or "sweep"
        records = []
        with open(self.storage) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("study", "sweep") == study:
                    records.append(rec)
        return records

    def _append_journal(self, trial: int, params: dict, value: float) -> None:
        if self.storage is None:
            return
        self.storage.parent.mkdir(parents=True, exist_ok=True)
        with open(self.storage, "a") as fh:
            fh.write(json.dumps({"study": self.study_name or "sweep",
                                 "trial": trial, "params": params,
                                 "value": value}) + "\n")

    def _signed(self, value: float) -> float:
        return value if self.direction == "minimize" else -value

    def optimize(self, config_dir, config_name: str, base_overrides: list[str],
                 run_fn: Callable) -> dict:
        best = {"value": math.inf, "params": None, "trial": None}
        sweep_dir = None
        resumed = self._load_journal()
        for rec in resumed:  # journal trials seed TPE and count toward n_trials
            signed = self._signed(float(rec["value"]))
            self.observations.append((rec["params"], signed))
            if signed < best["value"]:
                best = {"value": signed, "params": rec["params"],
                        "trial": rec["trial"]}
        if resumed:
            log.info("Resumed %d completed trial(s) from %s (study=%s)",
                     len(resumed), self.storage, self.study_name or "sweep")
        for trial in range(len(resumed), self.n_trials):
            sampled = self.sampler.sample(self.space, self.observations)
            trial_overrides = [f"{k}={v}" for k, v in sampled.items()]
            cfg = compose(config_dir, config_name, base_overrides + trial_overrides)
            if sweep_dir is not None:
                # pin every trial to the FIRST trial's resolved sweep dir —
                # each compose() re-resolves ${now:...}, which would scatter
                # trials across different multirun timestamp directories
                cfg.update_dotted("hydra.sweep.dir", str(sweep_dir))
            run_dir = setup_run_dir(cfg, job_num=trial)
            sweep_dir = run_dir.parent
            setup_job_logging(cfg, str(cfg.task_name))
            log.info("Trial %d/%d: %s", trial + 1, self.n_trials, sampled)
            try:
                value = run_fn(cfg)
            except Exception as err:
                log.exception("Trial %d failed: %s", trial, err)
                continue
            if value is None:
                log.warning("Trial %d returned no objective (optimized_metric unset?)", trial)
                continue
            self.observations.append((sampled, self._signed(float(value))))
            if self._signed(float(value)) < best["value"]:
                best = {"value": self._signed(float(value)), "params": sampled, "trial": trial}
            with open(run_dir / "trial_result.json", "w") as f:
                json.dump({"trial": trial, "params": sampled, "value": float(value)}, f)
            self._append_journal(trial, sampled, float(value))

        result = {
            "name": self.study_name or "sweep",
            "direction": self.direction,
            "best_trial": best["trial"],
            "best_value": (best["value"] if self.direction == "minimize" else -best["value"])
            if best["params"] is not None else None,
            "best_params": best["params"],
            "n_completed": len(self.observations),
        }
        if sweep_dir is not None:
            with open(sweep_dir / "optimization_results.yaml", "w") as f:
                yaml.safe_dump(result, f)
        log.info("Sweep finished: %s", result)
        return result


def run_sweep(config_dir, config_name: str, overrides: list[str], run_fn: Callable) -> float | None:
    """Entry used by main.py -m: build the sweeper from hydra.sweeper config."""
    cfg = compose(config_dir, config_name, overrides)
    sweeper_cfg = cfg.select("hydra.sweeper")
    if sweeper_cfg is None:
        raise RuntimeError("multirun requested but no hydra.sweeper configured "
                           "(use hparams_search=optuna)")
    sweeper: TPESweeper = instantiate(sweeper_cfg)
    result = sweeper.optimize(config_dir, config_name, overrides, run_fn)
    return result.get("best_value")

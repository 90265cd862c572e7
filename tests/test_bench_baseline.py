"""bench.py torch-baseline provenance (VERDICT r4 weak #1).

BENCH_r04 produced an all-null driver record because the torch baselines were
gitignored: the run re-measured five torch composites on the 1-core host and
the watchdog killed the process before any TPU op ran. The invariants under
test: (1) committed files are the first source and never spawn a subprocess;
(2) BASELINE.json backfills a missing cache; (3) a re-measurement overrun or
failure SKIPS the phase with a note — it can never raise out of
load_reference_baseline, so it can never end a bench run.
"""
from __future__ import annotations

import json
import subprocess
from pathlib import Path

import pytest

import bench


@pytest.fixture
def no_subprocess(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("baseline subprocess spawned on the committed path")
    # bench imports subprocess inside the function, so the module-global
    # patch is what it sees
    monkeypatch.setattr(subprocess, "run", boom)


def test_committed_cache_is_complete_and_first(monkeypatch, no_subprocess):
    """The tracked BENCH_BASELINE_CACHE.json alone satisfies every METRICS
    base key — a fresh checkout never measures torch in the driver path."""
    monkeypatch.delenv("BENCH_REMEASURE_BASELINE", raising=False)
    base, note = bench.load_reference_baseline()
    assert note is None
    for _key, _fn, _args, base_key in bench.METRICS:
        assert isinstance(base.get(base_key), (int, float)), base_key


def test_baseline_cache_is_tracked():
    """The r4 failure was a gitignored cache — it must stay committed."""
    out = subprocess.check_output(["git", "ls-files",
                                   "BENCH_BASELINE_CACHE.json"],
                                  cwd=bench.REPO, text=True)
    assert out.strip() == "BENCH_BASELINE_CACHE.json"


def test_baseline_json_backfills_missing_cache(monkeypatch, tmp_path,
                                               no_subprocess):
    monkeypatch.delenv("BENCH_REMEASURE_BASELINE", raising=False)
    monkeypatch.setattr(bench, "CACHE", tmp_path / "absent.json")
    base, note = bench.load_reference_baseline()
    assert note is None
    assert all(k in base for k in bench.BASELINE_KEYS)
    mirror = json.loads((bench.REPO / "BASELINE.json").read_text())
    assert base == {k: v for k, v in
                    mirror["torch_reference_baseline"].items()}


def _isolate(monkeypatch, tmp_path: Path) -> None:
    """No committed source available: CACHE and BASELINE.json both absent."""
    monkeypatch.setattr(bench, "CACHE", tmp_path / "absent.json")
    monkeypatch.setattr(bench, "REPO", tmp_path)


def test_remeasure_timeout_skips_not_kills(monkeypatch, tmp_path):
    _isolate(monkeypatch, tmp_path)

    def timeout(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
    monkeypatch.setattr(subprocess, "run", timeout)
    base, note = bench.load_reference_baseline()  # must not raise
    assert base == {}
    assert "CPU" in note and "tunnel was never touched" in note


def test_remeasure_failure_skips_not_kills(monkeypatch, tmp_path):
    _isolate(monkeypatch, tmp_path)

    def fail(cmd, **kw):
        raise subprocess.CalledProcessError(1, cmd)
    monkeypatch.setattr(subprocess, "run", fail)
    base, note = bench.load_reference_baseline()
    assert base == {}
    assert "skipped" in note


def test_catalog_order_is_headline_then_cheapest_first():
    """Round-5 contract: a backend init behind a draining tunnel claim
    (~250 s measured) squeezes the per-run budget, so the catalog must put
    the two headline train steps first and then run cheapest-first (warm
    costs from examples/bench_r5_full.json) so a squeeze nulls only the
    expensive tail. A reorder regression silently degrades partial records
    (observed: 4/8 instead of 6/8 at the same squeeze)."""
    keys = [key for key, _fn, _args, _base in bench.METRICS]
    assert keys == [
        "vqvae_train_step_samples_per_sec_bf16",        # headline
        "vqvae_train_step_samples_per_sec_bf16_b128",   # headline lever
        "vqvae_encode_vq_samples_per_sec",              # ~2.8 s warm
        "vqvae_separation_samples_per_sec",             # ~11.5 s
        "vqvae_train_step_samples_per_sec_fp32",        # ~12.7 s
        "transformer_train_codes_per_sec",              # ~21 s
        "transformer_codes_per_sec",                    # ~39 s
        "bert_train_codes_per_sec",                     # ~53 s
    ]
    assert keys[0] == bench.HEADLINE


def test_remeasure_env_forces_subprocess(monkeypatch, tmp_path):
    """BENCH_REMEASURE_BASELINE=1 re-measures even with complete files, and a
    subprocess that lands numbers updates the returned baselines."""
    monkeypatch.setenv("BENCH_REMEASURE_BASELINE", "1")
    fresh_cache = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE", fresh_cache)

    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        fresh_cache.write_text(json.dumps(
            {k: 1.0 for k in bench.BASELINE_KEYS}))
    monkeypatch.setattr(subprocess, "run", fake_run)
    base, note = bench.load_reference_baseline()
    assert calls and "unlink" in calls[0][-1]
    assert note is None
    assert all(base[k] == 1.0 for k in bench.BASELINE_KEYS)

"""bench.py's driver-record emitter contract.

`_emit_record` prints THE one JSON line the driver captures into
BENCH_r{N}.json — from the normal path, the watchdog thread mid-run, or the
budget-squeezed tail. The invariants: exactly one line of valid JSON, the
headline metric mirrored at the top level, nulls (never missing keys) for
unfinished metrics so a partial record stays well-formed, vs_baseline ratios
only where a positive reference number exists, and note/compile-cache
provenance included when given.
"""
from __future__ import annotations

import json

import bench


def _emit(capsys, values, base, note=None, cache=None):
    bench._emit_record(values, base, note, cache)
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"driver expects ONE line, got {len(lines)}"
    return json.loads(lines[0])


def test_full_record_shape(capsys):
    values = {key: 100.0 * (i + 1) for i, (key, *_) in enumerate(bench.METRICS)}
    base = {base_key: 10.0 for *_, base_key in bench.METRICS}
    rec = _emit(capsys, values, base, cache={"dir": "/c", "entries": 5,
                                             "mb": 1.0, "preflight": "warm"})
    assert rec["unit"] == "samples/sec/chip"
    assert rec["value"] == values[bench.HEADLINE]
    assert rec["vs_baseline"] == round(values[bench.HEADLINE] / 10.0, 2)
    assert set(rec["metrics"]) == {key for key, *_ in bench.METRICS}
    for key, *_ in bench.METRICS:
        assert rec["metrics"][key]["value"] == values[key]
    assert rec["compile_cache"]["preflight"] == "warm"
    assert "note" not in rec


def test_partial_record_nulls_not_missing(capsys):
    # watchdog path: only the first metric finished; headline present
    first_key, *_, first_base = bench.METRICS[0]
    rec = _emit(capsys, {first_key: 50.0}, {first_base: 10.0},
                note="watchdog: phase 'x' exceeded its deadline")
    assert rec["value"] == 50.0 and rec["vs_baseline"] == 5.0
    for key, *_ in bench.METRICS[1:]:
        assert key in rec["metrics"], "partial records must keep every key"
        assert rec["metrics"][key]["value"] is None
        assert rec["metrics"][key]["vs_baseline"] is None
    assert "watchdog" in rec["note"]


def test_headline_missing_stays_well_formed(capsys):
    # the squeeze regression: init ate the budget before the headline ran
    rec = _emit(capsys, {}, {})
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["reference_baseline"] == {}
    assert "compile_cache" not in rec


def test_vs_baseline_guards_bad_reference(capsys):
    key, *_, base_key = bench.METRICS[0]
    for bad in ({}, {base_key: 0.0}, {base_key: -1.0}, {base_key: "n/a"}):
        rec = _emit(capsys, {key: 42.0}, bad)
        assert rec["metrics"][key]["value"] == 42.0
        assert rec["metrics"][key]["vs_baseline"] is None

"""Sweeper/sampler tests: search-space grammar, TPE convergence, sweep loop."""
import numpy as np

from msla_tpu.sweep.sampler import TPESampler
from msla_tpu.sweep.space import Categorical, Uniform, parse_distribution, parse_space


def test_space_grammar():
    d = parse_distribution("interval(0.0001, 0.1)")
    assert isinstance(d, Uniform) and d.low == 0.0001 and d.high == 0.1
    c = parse_distribution("choice(64, 128, 256)")
    assert isinstance(c, Categorical) and c.choices == [64, 128, 256]
    c2 = parse_distribution("choice(32, 64,128)")  # reference's spacing quirk
    assert c2.choices == [32, 64, 128]
    r = parse_distribution("range(1, 4)")
    assert r.choices == [1, 2, 3]
    space = parse_space({"model.vqvae.learning_rate": "interval(0.0001, 0.1)",
                         "data.batch_size": "choice(32, 64, 128, 256)"})
    assert len(space) == 2


def test_tpe_converges_on_quadratic():
    """TPE should concentrate samples near the optimum vs pure random."""
    space = parse_space({"x": "interval(-5, 5)", "c": "choice(1, 2, 3)"})
    sampler = TPESampler(seed=0, n_startup_trials=8)
    obs = []
    for _ in range(60):
        params = sampler.sample(space, obs)
        # objective: (x-2)^2, c=2 best
        value = (params["x"] - 2.0) ** 2 + (0.0 if params["c"] == 2 else 1.0)
        obs.append((params, value))
    late_x = np.array([p["x"] for p, _ in obs[-20:]])
    assert abs(np.median(late_x) - 2.0) < 1.5
    late_c = [p["c"] for p, _ in obs[-20:]]
    assert late_c.count(2) >= 10


def test_sweeper_optimize_loop(tmp_path):
    """End-to-end sweep over a synthetic objective through compose()."""
    from msla_tpu.sweep.sweeper import TPESweeper

    # minimal config tree
    (tmp_path / "cfgs").mkdir()
    (tmp_path / "cfgs" / "t.yaml").write_text(
        "task_name: sweeptest\nx: 0.0\npaths:\n  log_dir: %s\nhydra:\n  sweep:\n    dir: %s\n"
        % (tmp_path, tmp_path / "multirun"))

    def run_fn(cfg):
        return (float(cfg.x) - 0.3) ** 2

    sweeper = TPESweeper(params={"x": "interval(0, 1)"}, n_trials=12,
                         sampler=TPESampler(seed=1, n_startup_trials=5))
    result = sweeper.optimize(tmp_path / "cfgs", "t", [], run_fn)
    assert result["n_completed"] == 12
    assert abs(result["best_params"]["x"] - 0.3) < 0.25
    assert (tmp_path / "multirun").exists()
    assert (tmp_path / "multirun" / "optimization_results.yaml").exists()


def test_sweeper_storage_resume(tmp_path):
    """`storage` persists a JSONL trial journal; a second sweep with the same
    storage+study_name resumes — completed trials count toward n_trials and
    seed the sampler (reference optuna.yaml:19-32's resume surface)."""
    from msla_tpu.sweep.sweeper import TPESweeper

    (tmp_path / "cfgs").mkdir()
    (tmp_path / "cfgs" / "t.yaml").write_text(
        "task_name: sweeptest\nx: 0.0\npaths:\n  log_dir: %s\nhydra:\n  sweep:\n    dir: %s\n"
        % (tmp_path, tmp_path / "multirun"))
    journal = tmp_path / "journal" / "study.jsonl"
    calls = []

    def run_fn(cfg):
        calls.append(float(cfg.x))
        return (float(cfg.x) - 0.3) ** 2

    mk = lambda n: TPESweeper(params={"x": "interval(0, 1)"}, n_trials=n,
                              sampler=TPESampler(seed=1, n_startup_trials=3),
                              storage=str(journal), study_name="s1")
    r1 = mk(4).optimize(tmp_path / "cfgs", "t", [], run_fn)
    assert r1["n_completed"] == 4 and len(calls) == 4
    assert journal.exists() and len(journal.read_text().splitlines()) == 4

    # resume: 4 journaled + 3 fresh = 7; only 3 new run_fn calls
    r2 = mk(7).optimize(tmp_path / "cfgs", "t", [], run_fn)
    assert r2["n_completed"] == 7 and len(calls) == 7
    assert len(journal.read_text().splitlines()) == 7
    # best reflects the union (best_value is the signed-corrected minimum)
    vals = [(x - 0.3) ** 2 for x in calls]
    assert abs(r2["best_value"] - min(vals)) < 1e-12

    # a fully satisfied sweep re-runs nothing
    r3 = mk(7).optimize(tmp_path / "cfgs", "t", [], run_fn)
    assert r3["n_completed"] == 7 and len(calls) == 7

    # a different study in the same file is isolated
    other = TPESweeper(params={"x": "interval(0, 1)"}, n_trials=2,
                       sampler=TPESampler(seed=2, n_startup_trials=2),
                       storage=str(journal), study_name="s2")
    r4 = other.optimize(tmp_path / "cfgs", "t", [], run_fn)
    assert r4["n_completed"] == 2 and len(calls) == 9


def test_sweeper_storage_rejects_urls(tmp_path):
    """Non-path storage (optuna RDB URLs) fails loudly instead of being
    silently ignored."""
    import pytest

    from msla_tpu.sweep.sweeper import TPESweeper

    with pytest.raises(ValueError, match="RDB URLs"):
        TPESweeper(params={"x": "interval(0, 1)"},
                   storage="sqlite:///example.db")

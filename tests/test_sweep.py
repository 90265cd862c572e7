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

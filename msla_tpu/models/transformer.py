"""Transformer task module (reference: src/model/transformer.py:17-209).

MSE training loss per stem (transformer.py:44-47), the reference metric suite
on validation (prefix "validation") and test (prefix "testing" — the
reference's odd test-mode string, transformer.py:56), Adam optimizer, audio
demo on the first validation batch.
"""
from __future__ import annotations

import logging
import random
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msla_tpu.models.module import TaskModule
from msla_tpu.nn.transformer_net import TransformerQuantizerNet
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr_mean

log = logging.getLogger(__name__)

INSTRUMENTS = ("bass", "drums", "guitar", "piano")


class TransformerTask(TaskModule):
    test_mode_name = "testing"  # reference parity: transformer.py:56

    def __init__(self,
                 sample_rate: int,
                 frame_length: int,
                 learning_rate: float,
                 checkpoint_dir: str,
                 num_layers: int = 4,
                 num_heads: int = 8,
                 hidden_dim: int = 512,
                 positional_mode: str = "reference",
                 dropout: float = 0.1,
                 compute_dtype: str | None = None,
                 moe_experts: int = 0,
                 moe_selected: int = 2,
                 moe_aux_weight: float = 0.01):
        output_dim = sample_rate * frame_length
        input_dim = output_dim // 4
        self.hparams = dict(sample_rate=sample_rate, frame_length=frame_length,
                            learning_rate=learning_rate, checkpoint_dir=str(checkpoint_dir),
                            num_layers=num_layers, num_heads=num_heads,
                            hidden_dim=hidden_dim, positional_mode=positional_mode,
                            dropout=dropout, compute_dtype=compute_dtype,
                            moe_experts=moe_experts, moe_selected=moe_selected,
                            moe_aux_weight=moe_aux_weight)
        self.net = TransformerQuantizerNet(input_dim=input_dim, output_dim=output_dim,
                                           hidden_dim=hidden_dim, num_layers=num_layers,
                                           num_heads=num_heads, dropout=dropout,
                                           positional_mode=positional_mode,
                                           compute_dtype=compute_dtype,
                                           moe_experts=moe_experts,
                                           moe_selected=moe_selected)

    def init_variables(self, rng, batch):
        quantized, _ = batch
        return self.net.init(rng, quantized, deterministic=True)

    def configure_optimizer(self):
        return optax.adam(self.hparams["learning_rate"], b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(self, params, batch, rng):
        quantized, instruments = batch
        if self.hparams["moe_experts"] > 0:
            output, aux_vars = self.net.apply(
                {"params": params}, quantized, deterministic=False,
                rngs={"dropout": rng}, mutable=["losses"])
        else:
            output = self.net.apply({"params": params}, quantized, deterministic=False,
                                    rngs={"dropout": rng})
        loss = jnp.asarray(0.0)
        for i in range(4):
            loss = loss + mse_loss(output[:, i, :], instruments[:, i, :])
        metrics = {"train/loss": loss}
        if self.hparams["moe_experts"] > 0:
            # Switch load-balance aux (nn/moe.py), summed over layers
            aux = sum(jax.tree_util.tree_leaves(aux_vars.get("losses", {})),
                      jnp.asarray(0.0))
            metrics["train/moe_aux"] = aux
            loss = loss + self.hparams["moe_aux_weight"] * aux
        return loss, metrics

    supports_pipeline = True

    def pipeline_loss_fn(self, params, batch, rng, mesh, n_micro: int):
        """Training loss with the decoder-layer stack pipelined over the mesh
        `model` axis (Trainer `pipeline_parallel` knob; parallel/pipeline.py).

        Same per-stem MSE as loss_fn, dropout LIVE (per-layer/per-microbatch
        keys folded from `rng` — a different, equally valid stream than the
        sequential path's, so pp and dp runs are bit-comparable only at
        dropout=0.0, the setting tests/test_parallel.py pins)."""
        from msla_tpu.parallel.pipeline import pipelined_transformer_apply

        if self.hparams["moe_experts"] > 0:
            raise ValueError("pipeline_parallel and moe_experts both occupy the "
                             "mesh `model` axis — shard the experts instead "
                             "(model_parallel with MoE, see docs/PARALLELISM.md)")
        quantized, instruments = batch
        dropout_rng = rng if self.hparams["dropout"] > 0 else None
        output = pipelined_transformer_apply(self.net, params, quantized, mesh,
                                             n_micro=n_micro,
                                             dropout_rng=dropout_rng)
        loss = jnp.asarray(0.0)
        for i in range(4):
            loss = loss + mse_loss(output[:, i, :], instruments[:, i, :])
        return loss, {"train/loss": loss}

    def eval_metrics(self, params, batch, mode: str):
        """Metric catalog (reference: transformer.py:84-141)."""
        quantized, instruments = batch
        output = self.net.apply({"params": params}, quantized, deterministic=True)
        mixed_output = jnp.sum(output, axis=1)
        mixed = jnp.sum(instruments, axis=1)

        metrics = {}
        loss = jnp.asarray(0.0)
        for i, name in enumerate(INSTRUMENTS):
            pred, target = output[:, i, :], instruments[:, i, :]
            loss = loss + mse_loss(pred, target)
            metrics[f"{mode}/l2_{name}_loss"] = mse_loss(pred, target)
            metrics[f"{mode}/l1_{name}_loss"] = l1_loss(pred, target)
            metrics[f"{mode}/si_sdr_{name}_measure"] = si_sdr_mean(pred, target)
        metrics[f"{mode}/si_sdr_full_audio_measure"] = si_sdr_mean(mixed_output, mixed)
        metrics[f"{mode}/l2_full_audio_loss"] = mse_loss(mixed_output, mixed)
        metrics[f"{mode}/l1_full_audio_loss"] = l1_loss(mixed_output, mixed)
        metrics[f"{mode}/loss"] = loss
        return metrics

    def predict_step(self, params, batch):
        quantized, _ = batch
        return self.net.apply({"params": params}, quantized, deterministic=True)

    def on_validation_batch_end(self, trainer, params, batch, batch_idx: int) -> None:
        """Audio demo table (reference: transformer.py:143-204). `batch` is the
        raw (B,4,T) stems; the quantized input is rebuilt via the datamodule's
        teacher inside the jitted demo forward."""
        if batch_idx != 0 or not trainer.loggers:
            return
        from msla_tpu.models.demo import log_audio_demo

        stems = np.asarray(batch)
        index = random.randint(0, stems.shape[0] - 1)
        datamodule = getattr(trainer, "datamodule", None)
        if datamodule is None or datamodule.quantize is None:
            return
        if not hasattr(self, "_demo_fwd"):  # jit once (incl. the teacher)
            self._demo_fwd = jax.jit(lambda p, raw: self.net.apply(
                {"params": p}, datamodule.on_after_batch_transfer(raw)[0],
                deterministic=True))
        decode = lambda: np.asarray(self._demo_fwd(
            params, jnp.asarray(stems[index:index + 1]))[0])
        log_audio_demo(trainer, self.hparams["checkpoint_dir"],
                       int(self.hparams["sample_rate"]), stems[index], decode,
                       "transformer")

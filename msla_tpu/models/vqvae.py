"""VQ-VAE task module (reference: src/model/vqvae.py:21-243).

Training loss = embedding_loss + commitment_loss + Σᵢ L1(stemᵢ)
(reference: vqvae.py:62-66); validation/test log the reference's exact metric
catalog (vqvae.py:108-165); Adam(lr) (vqvae.py:168-171); codebook dumped to
CSV each epoch (vqvae.py:239-243); audio demo table on the first validation
batch (vqvae.py:173-237).
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
from msla_tpu.nn.vqvae_net import VQVAENet
from msla_tpu.ops.metrics import l1_loss, mse_loss, si_sdr_mean

log = logging.getLogger(__name__)

INSTRUMENTS = ("bass", "drums", "guitar", "piano")


class VQVAETask(TaskModule):
    def __init__(self,
                 num_hidden: int,
                 num_residual_layer: int,
                 num_residual_hidden: int,
                 num_embedding: int,
                 embedding_dim: int,
                 commitment_cost: float,
                 learning_rate: float,
                 sample_rate: int,
                 checkpoint_dir: str,
                 codebook_file: str,
                 use_pallas: bool | None = None,
                 compute_dtype: str | None = None):
        """compute_dtype: "bfloat16" runs the conv stacks in bf16 (params and
        VQ math stay fp32); enable via +model.vqvae.compute_dtype=bfloat16."""
        self.hparams = dict(num_hidden=num_hidden, num_residual_layer=num_residual_layer,
                            num_residual_hidden=num_residual_hidden,
                            num_embedding=num_embedding, embedding_dim=embedding_dim,
                            commitment_cost=commitment_cost, learning_rate=learning_rate,
                            sample_rate=sample_rate, checkpoint_dir=str(checkpoint_dir),
                            codebook_file=str(codebook_file),
                            compute_dtype=compute_dtype)
        self.net = VQVAENet(num_hidden=num_hidden,
                            num_residual_layer=num_residual_layer,
                            num_residual_hidden=num_residual_hidden,
                            num_embedding=num_embedding,
                            embedding_dim=embedding_dim,
                            commitment_cost=commitment_cost,
                            use_pallas=use_pallas,
                            compute_dtype=compute_dtype)

    # ---- pure steps -----------------------------------------------------------
    def init_variables(self, rng, batch):
        mixed, _ = batch
        return self.net.init(rng, mixed)

    def configure_optimizer(self):
        # Adam defaults match torch.optim.Adam(lr, amsgrad=False)
        return optax.adam(self.hparams["learning_rate"], b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(self, params, batch, rng):
        mixed, instruments = batch
        out = self.net.apply({"params": params}, mixed)
        loss = out.embedding_loss + out.commitment_loss
        for i in range(4):
            loss = loss + l1_loss(out.output[:, i, :], instruments[:, i, :])
        metrics = {"train/loss": loss, "train/perplexity": out.perplexity}
        return loss, metrics

    def eval_metrics(self, params, batch, mode: str):
        """Validation/test metric catalog (reference: vqvae.py:95-166)."""
        mixture, instruments = batch
        out = self.net.apply({"params": params}, mixture)

        original_mixture = jnp.sum(instruments, axis=1)
        mixed_output = jnp.sum(out.output, axis=1)

        metrics = {
            f"{mode}/embedding_loss": out.embedding_loss,
            f"{mode}/commitment_loss": out.commitment_loss,
            f"{mode}/perplexity": out.perplexity,
        }
        loss = out.embedding_loss + out.commitment_loss
        for i, name in enumerate(INSTRUMENTS):
            pred, target = out.output[:, i, :], instruments[:, i, :]
            loss = loss + l1_loss(pred, target)
            metrics[f"{mode}/l2_{name}_loss"] = mse_loss(pred, target)
            metrics[f"{mode}/l1_{name}_loss"] = l1_loss(pred, target)
            metrics[f"{mode}/si_sdr_{name}_measure"] = si_sdr_mean(pred, target)
        metrics[f"{mode}/si_sdr_full_audio_measure"] = si_sdr_mean(mixed_output, original_mixture)
        metrics[f"{mode}/l2_full_audio_loss"] = mse_loss(mixed_output, original_mixture)
        metrics[f"{mode}/l1_full_audio_loss"] = l1_loss(mixed_output, original_mixture)
        metrics[f"{mode}/loss"] = loss
        return metrics

    def predict_step(self, params, batch):
        mixed, _ = batch
        return self.net.apply({"params": params}, mixed).output

    def get_quantized(self, params, x):
        """Inference path used by Quantize / generate (reference: vqvae.py:88-93)."""
        return self.net.apply({"params": params}, x, method=VQVAENet.get_quantized)

    # ---- host-side hooks --------------------------------------------------------
    def on_train_epoch_end(self, trainer, params) -> None:
        """Persist the codebook as CSV each epoch (reference: vqvae.py:239-243).

        Written WITH a pandas-style integer header to match the committed
        artifact (logs/best_checkpoint/codebook.csv has a header row) and the
        read paths (AudioBert and the plotters read with header=True —
        bert.py:32, plotting.py:19). The reference's epoch-end dump writes
        header=False, which silently eats one codebook row on re-read — a
        reference bug we do not reproduce.
        """
        from msla_tpu.parallel.mesh import is_main_process

        if not is_main_process():  # multi-host: rank 0 owns artifact writes
            return
        codebook = np.asarray(params["vector_quantizer"]["codebook"])
        path = Path(self.hparams["codebook_file"])
        path.parent.mkdir(parents=True, exist_ok=True)
        header = ",".join(str(i) for i in range(codebook.shape[1]))
        np.savetxt(path, codebook, delimiter=",", header=header, comments="")

    def on_validation_batch_end(self, trainer, params, batch, batch_idx: int) -> None:
        """Audio demo table on the first validation batch (reference: vqvae.py:173-237)."""
        if batch_idx != 0 or not trainer.loggers:
            return
        from msla_tpu.models.demo import log_audio_demo

        # batch is the raw (B,4,T) stems; rebuild the mixture input locally
        stems = np.asarray(batch)
        mixture = stems.sum(axis=1, keepdims=True)
        model_in = np.broadcast_to(mixture, stems.shape)
        index = random.randint(0, stems.shape[0] - 1)
        if not hasattr(self, "_demo_fwd"):  # jit once; eager apply would
            self._demo_fwd = jax.jit(      # dispatch op-by-op every epoch
                lambda p, x: self.net.apply({"params": p}, x).output)
        decode = lambda: np.asarray(self._demo_fwd(
            params, jnp.asarray(model_in[index:index + 1]))[0])
        log_audio_demo(trainer, self.hparams["checkpoint_dir"],
                       int(self.hparams["sample_rate"]), stems[index], decode, "vqvae")

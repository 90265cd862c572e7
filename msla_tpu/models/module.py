"""Task-module protocol — the functional equivalent of the reference's
LightningModule hooks (reference: src/model/vqvae.py:55-243 et al.).

A task module owns a flax network plus hyperparameters and exposes PURE,
jittable step functions; the Trainer composes them with the optimizer,
sharding and logging. Hook names mirror Lightning's so the mapping is 1:1:

  training_step   → loss_fn(params, batch, rng) -> (loss, metrics)
  validation_step/test_step → eval_metrics(params, batch, mode) -> metrics
  configure_optimizers      → configure_optimizer() -> optax transform
  on_train_epoch_end / on_validation_batch_end / predict_step → host-side hooks
"""
from __future__ import annotations

from typing import Any, Mapping, Tuple

import jax
import optax


class TaskModule:
    hparams: dict
    #: metric prefix used by test_step (the reference's transformer logs
    #: "testing/..." while vqvae/bert log "test/..." — transformer.py:56)
    test_mode_name: str = "test"

    # ---- pure / jittable ---------------------------------------------------
    def init_variables(self, rng: jax.Array, batch: Tuple[jax.Array, jax.Array]) -> Mapping:
        raise NotImplementedError

    def configure_optimizer(self) -> optax.GradientTransformation:
        raise NotImplementedError

    def loss_fn(self, params: Any, batch: Tuple[jax.Array, jax.Array],
                rng: jax.Array) -> Tuple[jax.Array, Mapping[str, jax.Array]]:
        raise NotImplementedError

    def eval_metrics(self, params: Any, batch: Tuple[jax.Array, jax.Array],
                     mode: str) -> Mapping[str, jax.Array]:
        raise NotImplementedError

    #: set True (and implement pipeline_loss_fn) on tasks whose layer stack
    #: can train pipeline-parallel (Trainer `pipeline_parallel` knob)
    supports_pipeline: bool = False

    def pipeline_loss_fn(self, params: Any, batch, rng: jax.Array, mesh,
                         n_micro: int) -> Tuple[jax.Array, Mapping[str, jax.Array]]:
        """loss_fn with the layer stack pipelined over the mesh `model` axis
        (parallel/pipeline.py). Beyond-reference scaling hook; no Lightning
        equivalent."""
        raise NotImplementedError(f"{type(self).__name__} has no pipeline-parallel path")

    # ---- host-side hooks -----------------------------------------------------
    def on_train_epoch_end(self, trainer, params: Any) -> None:
        pass

    def on_validation_batch_end(self, trainer, params: Any, batch, batch_idx: int) -> None:
        pass

    def predict_step(self, params: Any, batch) -> Any:
        raise NotImplementedError

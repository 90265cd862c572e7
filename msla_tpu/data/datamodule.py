"""Slakh datamodule (reference: src/data/datamodule.py:14-119).

Same loader surface (train/val/test/predict, train shuffled, drop_last on
train/val/test, predict batch_size 1) and the same post-transfer batch
semantics — but ``on_after_batch_transfer`` here is a PURE jax function the
trainer executes INSIDE the jitted step, so mixture construction and the
frozen-VQVAE teacher pass run on-device, fused with the model step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from msla_tpu.data.dataset import SlakhDataset
from msla_tpu.data.loader import DataLoader
from msla_tpu.data.transform import Quantize


class SlakhDataModule:
    def __init__(self,
                 train_dir: str,
                 val_dir: str,
                 test_dir: str,
                 target_sample_rate: int,
                 target_sample_duration: int,
                 max_duration: int,
                 maximum_dataset_size: int,
                 batch_size: int,
                 persistent_workers: bool = True,
                 num_workers: int = 1,
                 pin_memory: bool = False,
                 masking: bool = False,
                 quantizer: Optional[Quantize] = None,
                 quantized_latents: bool = False,
                 seed: int = 0):
        """
        @param quantizer: frozen-VQVAE teacher for second-stage training
        @param quantized_latents: with a quantizer, return quantized latents
               (transformer mode) instead of codebook indices (BERT mode).
               The reference returns indices for both (datamodule.py:114-115,
               the latents line is commented out); SURVEY.md §2 quirk 2 says
               to build both modes.
        """
        self.train_dir = train_dir
        self.val_dir = val_dir
        self.test_dir = test_dir
        self.quantize = quantizer
        self.quantized_latents = quantized_latents
        self.target_sample_rate = target_sample_rate
        self.target_sample_duration = target_sample_duration
        self.max_duration = max_duration
        self.maximum_dataset_size = maximum_dataset_size
        self.batch_size = batch_size
        self.pin_memory = pin_memory            # accepted for config parity; no-op on TPU
        self.num_workers = num_workers
        self.persistent_workers = persistent_workers  # accepted for config parity
        self.masking = masking
        self.seed = seed

    def create_dataset(self, path: str, masking: bool = False) -> SlakhDataset:
        return SlakhDataset(path,
                            target_sample_rate=self.target_sample_rate,
                            target_sample_duration=self.target_sample_duration,
                            max_duration=self.max_duration,
                            maximum_dataset_size=self.maximum_dataset_size,
                            masking=masking)

    # Datasets are built per dataloader call, like the reference
    # (datamodule.py:77 note about building in setup()); multi-host runs get
    # the DistributedSampler role for free — each host loads a disjoint
    # 1/process_count interleave (Lightning injects the sampler for the
    # reference, src/data/datamodule.py:76-110).
    def _loader(self, dataset, **kw) -> DataLoader:
        from msla_tpu.parallel.mesh import process_info

        rank, count = process_info()
        return DataLoader(dataset, num_workers=self.num_workers, seed=self.seed,
                          process_index=rank, process_count=count, **kw)

    def train_dataloader(self) -> DataLoader:
        return self._loader(self.create_dataset(self.train_dir, masking=self.masking),
                            batch_size=self.batch_size, shuffle=True, drop_last=True)

    def val_dataloader(self) -> DataLoader:
        return self._loader(self.create_dataset(self.val_dir),
                            batch_size=self.batch_size, shuffle=False, drop_last=True)

    def test_dataloader(self) -> DataLoader:
        return self._loader(self.create_dataset(self.test_dir),
                            batch_size=self.batch_size, shuffle=False, drop_last=True)

    def predict_dataloader(self) -> DataLoader:
        return self._loader(self.create_dataset(self.test_dir),
                            batch_size=1, shuffle=False, drop_last=False)

    # ---- device-side batch transform (jittable) ----------------------------
    def train_transform(self, batch: jax.Array, rng: jax.Array) -> jax.Array:
        """Train-only masking augmentation, applied inside the jitted step
        (the reference applies it per-item on the CPU — dataset.py:42-49)."""
        if not self.masking:
            return batch
        from msla_tpu.data.augment import masking_augment

        return masking_augment(batch, rng)

    def on_after_batch_transfer(self, batch: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(B, 4, T) stems → (model_input, target_stems), on device, inside jit.

        Without a quantizer (VQ-VAE stage): the model input is the mixture
        (sum over stems) replicated across the encoder's 4 input channels —
        the documented intent of the reference's shape-broken einsum
        (datamodule.py:118-119; SURVEY.md §2 quirk 1).
        With a quantizer (second stages): codebook indices (default, matching
        the committed reference) or quantized latents (quantized_latents=True).
        """
        if self.quantize is not None:
            if self.quantized_latents:
                return self.quantize.get_quantized(batch), batch
            return self.quantize.get_encodings_idx(batch), batch

        mixture = jnp.sum(batch, axis=1, keepdims=True)      # (B, 1, T)
        model_input = jnp.broadcast_to(mixture, batch.shape)  # (B, 4, T)
        return model_input, batch

"""Latent-to-waveform decoder (reference: src/model/components/decoder.py:7-33).

Conv k3s1p1 → ResidualStack → ConvT k4s2p1 + ReLU → ConvT k4s2p1.
Net 4× temporal upsample back to the waveform, 4 output stems:
(B, W, embedding_dim) → (B, 4W, 4) in NWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.layers import Conv1d, ConvTranspose1d
from msla_tpu.nn.residual_stack import ResidualStack


class Decoder(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    out_channels: int = 4
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv1d(self.num_hidden, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                   name="conv1")(x)
        x = ResidualStack(self.num_hidden, self.num_residual_layer,
                          self.num_residual_hidden, dtype=self.dtype,
                          name="residual_stack")(x)
        x = jax.nn.relu(ConvTranspose1d(self.num_hidden // 2, kernel_size=4, stride=2,
                                        padding=1, dtype=self.dtype,
                                        name="conv1_transpose")(x))
        out = ConvTranspose1d(self.out_channels, kernel_size=4, stride=2, padding=1,
                              dtype=self.dtype, name="conv2_transpose")(x)
        return out.astype(jnp.float32)

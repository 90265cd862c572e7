"""Waveform encoder (reference: src/model/components/encoder.py:7-29).

Conv k4s2p1 + ReLU → Conv k4s2p1 + ReLU → Conv k3s1p1 → ResidualStack.
Net 4× temporal downsample: (B, T, 4) → (B, T/4, num_hidden) in NWC.
"""
from __future__ import annotations

import jax
from flax import linen as nn

from msla_tpu.nn.layers import Conv1d
from msla_tpu.nn.residual_stack import ResidualStack


class Encoder(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jax.nn.relu(Conv1d(self.num_hidden // 2, kernel_size=4, stride=2, padding=1,
                               dtype=self.dtype, name="conv1")(x))
        x = jax.nn.relu(Conv1d(self.num_hidden, kernel_size=4, stride=2, padding=1,
                               dtype=self.dtype, name="conv2")(x))
        x = Conv1d(self.num_hidden, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                   name="conv3")(x)
        return ResidualStack(self.num_hidden, self.num_residual_layer,
                             self.num_residual_hidden, dtype=self.dtype,
                             name="residual_stack")(x)

"""Waveform encoder (reference: src/model/components/encoder.py:7-29).

Conv k4s2p1 + ReLU → Conv k4s2p1 + ReLU → Conv k3s1p1 → ResidualStack.
Net 4× temporal downsample: (B, T, 4) → (B, T/4, num_hidden) in NWC.

The two strided stem convs route through ops/conv_stem.py: a hand-scheduled
fused Pallas kernel (fuse_stem=True) or XLA's own conv fusion (the measured
winner on v5e and the default — see conv_stem's docstring). The param tree is
identical either way (ConvParams mirrors Conv1d's `convN/conv/{kernel,bias}`
naming), so checkpoints are interchangeable.
"""
from __future__ import annotations

import jax
from flax import linen as nn

from msla_tpu.nn.layers import Conv1d, ConvParams
from msla_tpu.nn.residual_stack import ResidualStack
from msla_tpu.ops.conv_stem import conv_stem


class Encoder(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    dtype: str | None = None
    #: None → XLA convs (the measured winner on v5e — PERFORMANCE.md);
    #: True opts into the fused Pallas stem kernel (ops/conv_stem.py)
    fuse_stem: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c1 = self.num_hidden // 2
        k1, b1 = ConvParams((4, x.shape[-1], c1), name="conv1")()
        k2, b2 = ConvParams((4, c1, self.num_hidden), name="conv2")()
        if self.dtype:
            x, k1, k2 = x.astype(self.dtype), k1.astype(self.dtype), k2.astype(self.dtype)
        x = conv_stem(x, k1, b1, k2, b2, use_pallas=self.fuse_stem)
        x = Conv1d(self.num_hidden, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                   name="conv3")(x)
        return ResidualStack(self.num_hidden, self.num_residual_layer,
                             self.num_residual_hidden, dtype=self.dtype,
                             name="residual_stack")(x)

"""Latent-to-waveform decoder (reference: src/model/components/decoder.py:7-33).

Conv k3s1p1 → ResidualStack → ConvT k4s2p1 + ReLU → ConvT k4s2p1.
Net 4× temporal upsample back to the waveform, 4 output stems:
(B, W, embedding_dim) → (B, 4W, 4) in NWC.

The two transposed convs route through ops/deconv_stem.py: a hand-scheduled
fused Pallas kernel (fuse_stem=True) or XLA's conv_transpose lowering (the
measured winner on v5e and the default — see deconv_stem's docstring). The
param tree matches the unfused layers exactly (ConvTransposeParams mirrors
ConvTranspose1d naming/init), so checkpoints are interchangeable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.layers import Conv1d, ConvTransposeParams
from msla_tpu.nn.residual_stack import ResidualStack
from msla_tpu.ops.deconv_stem import deconv_stem


class Decoder(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    out_channels: int = 4
    dtype: str | None = None
    #: None → XLA conv_transposes (the measured winner on v5e —
    #: PERFORMANCE.md); True opts into the Pallas kernel (ops/deconv_stem.py)
    fuse_stem: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv1d(self.num_hidden, kernel_size=3, stride=1, padding=1, dtype=self.dtype,
                   name="conv1")(x)
        x = ResidualStack(self.num_hidden, self.num_residual_layer,
                          self.num_residual_hidden, dtype=self.dtype,
                          name="residual_stack")(x)
        c1 = self.num_hidden // 2
        k1, b1 = ConvTransposeParams((4, c1, self.num_hidden),
                                     name="conv1_transpose")()
        k2, b2 = ConvTransposeParams((4, self.out_channels, c1),
                                     name="conv2_transpose")()
        if self.dtype:
            x, k1, k2 = x.astype(self.dtype), k1.astype(self.dtype), k2.astype(self.dtype)
        out = deconv_stem(x, k1, b1, k2, b2, use_pallas=self.fuse_stem)
        return out.astype(jnp.float32)

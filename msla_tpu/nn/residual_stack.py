"""Residual conv stack (reference: src/model/components/residual_stack.py:5-26).

N blocks of [ReLU → Conv k3 (no bias) → ReLU → Conv k1 (no bias)] with an
additive skip, followed by a final ReLU. Operates in NWC; XLA fuses the ReLUs
into the conv epilogues on TPU.
"""
from __future__ import annotations

import jax
from flax import linen as nn

from msla_tpu.nn.layers import Conv1d


class ResidualStack(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    dtype: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_residual_layer):
            # Reference quirk: the blocks use nn.ReLU(inplace=True), which
            # mutates the skip operand before the addition — so the skip
            # connection effectively adds relu(x), not x. Replicated here
            # (verified numerically against the reference in
            # tests/test_parity_torch.py).
            x = jax.nn.relu(x)
            h = Conv1d(self.num_residual_hidden, kernel_size=3, stride=1, padding=1,
                       use_bias=False, dtype=self.dtype, name=f"block{i}_conv3")(x)
            h = jax.nn.relu(h)
            h = Conv1d(self.num_hidden, kernel_size=1, stride=1, padding=0,
                       use_bias=False, dtype=self.dtype, name=f"block{i}_conv1")(h)
            x = x + h
        return jax.nn.relu(x)

"""Sinusoidal positional encoding (reference: src/model/transformer.py:212-225).

Reference quirk (verified in tests/test_transformer.py): the reference slices
``pe[:, :x.size(1)]`` on a SEQ-FIRST tensor, so dim 1 is the BATCH — each
sample b gets the constant vector pe[b] added at every sequence position.
mode="reference" replicates that committed behavior; mode="standard" applies
the conventional per-position encoding.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 10000
    mode: str = "reference"  # "reference" (batch-indexed quirk) | "standard"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, S, D) batch-first."""
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        b, s, _ = x.shape
        if self.mode == "reference":
            return x + pe[:b][:, None, :]   # pe[b] at every position (quirk)
        return x + pe[:s][None, :, :]       # conventional per-position

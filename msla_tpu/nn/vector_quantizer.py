"""VectorQuantizer flax module (reference: src/model/components/vector_quantizer.py:6-54).

Holds the (num_embedding, embedding_dim) codebook initialized
U(±1/num_embedding) and delegates the math to msla_tpu.ops.vq.
Inputs are NWC (B, W, C) — already channel-last, so no BCW→BWC transpose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.ops.vq import VQResult, vector_quantize


class VectorQuantizer(nn.Module):
    num_embedding: int
    embedding_dim: int
    commitment_cost: float
    use_pallas: bool | None = None

    def setup(self):
        def codebook_init(key, shape, dtype=jnp.float32):
            lim = 1.0 / self.num_embedding
            return jax.random.uniform(key, shape, dtype, -lim, lim)

        self.codebook = self.param("codebook", codebook_init,
                                   (self.num_embedding, self.embedding_dim))

    def __call__(self, x: jax.Array, inference: bool = False) -> VQResult:
        # inference=True pins the jnp path: XLA DCEs the unused VQResult
        # fields there, which beats the (all-outputs) fused training kernel
        return vector_quantize(x, self.codebook, self.commitment_cost,
                               use_pallas=False if inference else self.use_pallas)

    def lookup(self, indices: jax.Array) -> jax.Array:
        """Code ids → codebook rows (NWC embedding gather)."""
        return jnp.take(self.codebook, indices, axis=0)

"""VQ-VAE network (reference: src/model/vqvae.py:21-93).

Encoder → 1×1 pre-VQ conv → VectorQuantizer → Decoder. Public tensors keep the
reference's BCW layout ((B, 4, T) stems in, (B, 4, T) out; quantized latents
(B, embedding_dim, W)); internally everything is NWC for TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.decoder import Decoder
from msla_tpu.nn.encoder import Encoder
from msla_tpu.nn.layers import Conv1d
from msla_tpu.nn.vector_quantizer import VectorQuantizer


class VQVAEOutput(NamedTuple):
    output: jax.Array           # (B, 4, T) reconstructed stems
    embedding_loss: jax.Array
    commitment_loss: jax.Array
    perplexity: jax.Array


class QuantizedOutput(NamedTuple):
    quantized: jax.Array        # (B, embedding_dim, W) — reference layout
    encoding_indices: jax.Array  # (B, W) int32
    perplexity: jax.Array


class VQVAENet(nn.Module):
    num_hidden: int
    num_residual_layer: int
    num_residual_hidden: int
    num_embedding: int
    embedding_dim: int
    commitment_cost: float
    use_pallas: bool | None = None
    #: conv compute dtype ("bfloat16" halves activation HBM traffic; params
    #: and the VQ distance/loss math stay fp32 for code-index parity)
    compute_dtype: str | None = None
    #: opt-in fused stem kernels (None/False → XLA, the measured winner)
    fuse_stem: bool | None = None

    def setup(self):
        self.encoder = Encoder(self.num_hidden, self.num_residual_layer,
                               self.num_residual_hidden, dtype=self.compute_dtype,
                               fuse_stem=self.fuse_stem)
        # 1×1 conv projecting hidden → embedding dim (reference: vqvae.py:44)
        self.pre_vq_conv = Conv1d(self.embedding_dim, kernel_size=1, stride=1, padding=0,
                                  dtype=self.compute_dtype)
        self.vector_quantizer = VectorQuantizer(self.num_embedding, self.embedding_dim,
                                                self.commitment_cost, self.use_pallas)
        self.decoder = Decoder(self.num_hidden, self.num_residual_layer,
                               self.num_residual_hidden, dtype=self.compute_dtype,
                               fuse_stem=self.fuse_stem)

    def encode(self, x_bcw: jax.Array) -> jax.Array:
        """(B, 4, T) → (B, W, embedding_dim) pre-quantization latents (NWC)."""
        x = jnp.swapaxes(x_bcw, -1, -2)  # BCW → NWC, once at the boundary
        return self.pre_vq_conv(self.encoder(x)).astype(jnp.float32)

    def __call__(self, x_bcw: jax.Array) -> VQVAEOutput:
        """Forward pass (reference: vqvae.py:81-86)."""
        z = self.encode(x_bcw)
        res = self.vector_quantizer(z)
        out = self.decoder(res.quantized_ste)
        return VQVAEOutput(jnp.swapaxes(out, -1, -2), res.embedding_loss,
                           res.commitment_loss, res.perplexity)

    def get_quantized(self, x_bcw: jax.Array) -> QuantizedOutput:
        """Inference path to the quantized representation (reference: vqvae.py:88-93).

        Gradients are stopped by the caller (wrap in jax.lax.stop_gradient or
        simply don't differentiate through it). Uses the jnp VQ path
        regardless of use_pallas: inference consumers rarely need every
        VQResult field, and XLA dead-code-eliminates the unused ones (the
        fused kernel is a black box that always computes all of them — it
        only pays off in training, where everything is consumed).
        """
        z = self.encode(x_bcw)
        res = self.vector_quantizer(z, inference=True)
        quantized_bcw = jnp.swapaxes(res.quantized_ste, -1, -2)
        return QuantizedOutput(quantized_bcw, res.encoding_indices, res.perplexity)

    def decode(self, quantized_bcw: jax.Array) -> jax.Array:
        """(B, embedding_dim, W) quantized latents → (B, 4, T) stems."""
        out = self.decoder(jnp.swapaxes(quantized_bcw, -1, -2))
        return jnp.swapaxes(out, -1, -2)

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        """(B, W) code ids → (B, 4, T) stems, via codebook lookup + decoder."""
        quantized = self.vector_quantizer.lookup(indices)  # (B, W, D) NWC
        out = self.decoder(quantized)
        return jnp.swapaxes(out, -1, -2)

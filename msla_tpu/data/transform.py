"""Quantize transform (reference: src/data/transform.py:5-16).

Wraps a frozen, trained VQ-VAE so second-stage training (transformer / BERT)
can map waveform batches to quantized latents or codebook indices. Unlike the
reference — which runs the teacher VQ-VAE inside the data hook
(datamodule.py:112-115) — the returned functions are pure and jittable, so the
trainer folds the teacher forward INTO the jitted train step and XLA overlaps
it with the student's compute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from msla_tpu.nn.vqvae_net import VQVAENet


class Quantize:
    """Callable teacher: frozen VQVAE params + apply fns."""

    def __init__(self, net: VQVAENet, variables: dict):
        self.net = net
        self.variables = jax.tree_util.tree_map(jax.lax.stop_gradient, variables)

    def get_quantized(self, x: jax.Array) -> jax.Array:
        """(B, 4, T) stems → (B, embedding_dim, W) quantized latents."""
        return self.net.apply(self.variables, x, method=VQVAENet.get_quantized).quantized

    def get_encodings_idx(self, x: jax.Array) -> jax.Array:
        """(B, 4, T) stems → (B, W) int32 codebook indices."""
        return self.net.apply(self.variables, x,
                              method=VQVAENet.get_quantized).encoding_indices


class ToComplex:
    """Cast to complex64 (reference: transform.py:19-23) — used between the
    masked power spectrogram and the inverse STFT."""

    def __call__(self, x: jax.Array) -> jax.Array:
        return x.astype(jnp.complex64)

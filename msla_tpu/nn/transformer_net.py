"""Transformer decoder over quantized latents
(reference: src/model/transformer.py:17-82).

Architecture: Linear embed (latent width → hidden) → PositionalEncoding →
N× torch-style post-norm decoder layers (causal self-attention + zero-memory
cross-attention + ReLU FFN) → reshape to 4 stems → Linear to waveform.

The reference feeds an all-zeros memory to every cross-attention
(transformer.py:72-74). With V = 0 the attention output is exactly the
out-projection bias, so `zero_memory=True` (default) computes that bias-add
analytically instead of burning MXU cycles on matmuls with zeros — bitwise
the same result, verified against torch in tests/test_transformer.py.
`zero_memory=False` runs real cross-attention for externally supplied memory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.attention import MultiHeadAttention, causal_mask
from msla_tpu.nn.layers import torch_bias_init, torch_kernel_init
from msla_tpu.nn.positional import PositionalEncoding


class DecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer semantics (post-norm, ReLU FFN)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    zero_memory: bool = True
    dtype: str | None = None
    moe_experts: int = 0      # >0 swaps the dense FFN for a routed MoE (nn/moe.py)
    moe_selected: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array | None, mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        dropout = lambda a: nn.Dropout(self.dropout)(a, deterministic=deterministic)

        sa = MultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                dtype=self.dtype, name="self_attn")(x, x, x, mask=mask,
                                                  deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + dropout(sa))

        if self.zero_memory:
            # cross-attn with zero memory collapses to its out-proj bias
            bias = self.param("cross_attn_out_bias", torch_bias_init(self.d_model),
                              (self.d_model,))
            ca = jnp.broadcast_to(bias, x.shape)
        else:
            ca = MultiHeadAttention(self.d_model, self.num_heads, self.dropout,
                                    dtype=self.dtype, name="cross_attn")(x, memory, memory,
                                                       deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + dropout(ca))

        if self.moe_experts > 0:
            from msla_tpu.nn.moe import MoEFFN

            h = MoEFFN(self.d_model, self.dim_feedforward, self.moe_experts,
                       num_selected=self.moe_selected, dropout=self.dropout,
                       dtype=self.dtype, name="moe")(x, deterministic=deterministic)
        else:
            h = nn.Dense(self.dim_feedforward, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(self.d_model), dtype=self.dtype,
                         name="linear1")(x)
            h = dropout(jax.nn.relu(h))
            h = nn.Dense(self.d_model, kernel_init=torch_kernel_init,
                         bias_init=torch_bias_init(self.dim_feedforward), dtype=self.dtype,
                         name="linear2")(h).astype(jnp.float32)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + dropout(h))


class TransformerQuantizerNet(nn.Module):
    """Full quantized-latents → stems network (reference: transformer.py:31-82)."""

    input_dim: int           # latent width W = T/4 (11000 at reference scale)
    output_dim: int          # waveform length T (44000)
    hidden_dim: int = 512
    num_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    positional_mode: str = "reference"
    zero_memory: bool = True
    compute_dtype: str | None = None
    moe_experts: int = 0
    moe_selected: int = 2

    @nn.compact
    def __call__(self, quantized: jax.Array, deterministic: bool = True) -> jax.Array:
        """(B, S=latent channels, input_dim) → (B, 4, output_dim)."""
        b, s, _ = quantized.shape
        x = nn.Dense(self.hidden_dim, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.input_dim), dtype=self.compute_dtype,
                     name="embedding")(quantized).astype(jnp.float32)
        x = PositionalEncoding(self.hidden_dim, mode=self.positional_mode,
                               name="positional_encoding")(x)
        mask = causal_mask(s, x.dtype)
        for i in range(self.num_layers):
            x = DecoderLayer(self.hidden_dim, self.num_heads, dropout=self.dropout,
                             zero_memory=self.zero_memory, dtype=self.compute_dtype,
                             moe_experts=self.moe_experts,
                             moe_selected=self.moe_selected,
                             name=f"layer{i}")(
                x, None, mask, deterministic=deterministic)
        # (B, S, hidden) → (B, 4, S*hidden/4) → Linear to waveform
        x = x.reshape(b, 4, (s * self.hidden_dim) // 4)
        out = nn.Dense(self.output_dim, kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init((self.hidden_dim * s) // 4),
                       dtype=self.compute_dtype, name="fc")(x)
        return out.astype(jnp.float32)

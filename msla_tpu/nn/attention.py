"""Multi-head attention matching torch.nn.MultiheadAttention semantics
(packed in-proj; used by the reference via nn.TransformerDecoderLayer —
reference: src/model/transformer.py:36-37).

Batch-first (B, S, E) layout. The attention math runs on the MXU as three
batched matmuls. Two inner paths:

* additive `mask` (the transformer's 64-token causal decoder) → plain XLA
  chain; sequences are tiny and XLA fuses the softmax.
* `kv_mask` key-padding (the 512-token Audio-BERT encoder) → routed through
  ops.flash_attn, which picks the Pallas flash-attention kernel on TPU
  (avoids the (B, H, 512, 512) HBM score tensor; measured 1.8× faster per
  layer) and the identical XLA chain elsewhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.layers import torch_bias_init, torch_kernel_init
from msla_tpu.ops.flash_attn import scaled_attention


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: str | None = None
    #: None → flash kernel on TPU for kv_mask-style calls; False → never
    use_flash: bool | None = None

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array,
                 mask: jax.Array | None = None,
                 kv_mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        e, h = self.embed_dim, self.num_heads
        head_dim = e // h
        b, s_q, _ = query.shape
        s_k = key.shape[1]

        # torch packs q/k/v projections into one (3E, E) in_proj — we keep
        # three Dense layers; utils.torch_compat slices the packed weight.
        q = nn.Dense(e, kernel_init=torch_kernel_init, bias_init=torch_bias_init(e),
                     dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(e, kernel_init=torch_kernel_init, bias_init=torch_bias_init(e),
                     dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(e, kernel_init=torch_kernel_init, bias_init=torch_bias_init(e),
                     dtype=self.dtype, name="v_proj")(value)

        q = q.reshape(b, s_q, h, head_dim).transpose(0, 2, 1, 3)  # (B,H,S,hd)
        k = k.reshape(b, s_k, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s_k, h, head_dim).transpose(0, 2, 1, 3)

        sm_scale = 1.0 / float(head_dim) ** 0.5
        dropping = self.dropout > 0.0 and not deterministic
        if mask is None and not dropping:
            # key-padding (or unmasked) attention: flash-eligible
            out = scaled_attention(q, k, v, kv_mask=kv_mask, sm_scale=sm_scale,
                                   use_flash=self.use_flash)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * sm_scale
            if mask is not None:
                scores = scores + mask  # additive mask (-inf on disallowed)
            if kv_mask is not None:
                scores = scores + (1.0 - kv_mask[:, None, None, :]
                                   .astype(jnp.float32)) * -1e9
            weights = jax.nn.softmax(scores, axis=-1)  # fp32 for stability
            if dropping:
                weights = nn.Dropout(self.dropout, name="attn_drop")(
                    weights, deterministic=False)

            # cast the probabilities back to the compute dtype so the AV matmul
            # runs at bf16 MXU rate instead of promoting to an fp32 dot
            out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, s_q, e)
        out = nn.Dense(e, kernel_init=torch_kernel_init, bias_init=torch_bias_init(e),
                       dtype=self.dtype, name="out_proj")(out)
        # fp32 mode keeps the residual stream fp32; in bf16 mode the caller's
        # residual adds/norms stay bf16 (halves the elementwise HBM traffic)
        return out if self.dtype else out.astype(jnp.float32)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask (reference: generate_square_subsequent_mask,
    transformer.py:71)."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype), k=1)
    return mask[None, None]  # (1, 1, S, S)

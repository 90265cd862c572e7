"""Native flax BERT encoder + masked-LM head.

Replaces the reference's HF `BertForMaskedLM.from_pretrained('bert-base-uncased')`
(reference: src/model/bert.py:33). Architecture and weight layout follow
bert-base-uncased exactly (post-norm encoder, erf-GeLU, layernorm eps 1e-12,
tied MLM decoder weights) so converted HF checkpoints drop in
(tools/convert_hf_bert.py); without a converted checkpoint the model runs
randomly initialized. Parity vs the HF torch implementation is tested with a
small random config in tests/test_bert.py.

TPU notes: seq 512 / hidden 768 / vocab 30522 map cleanly onto the MXU; the
chunked Audio-BERT caller folds chunks into the batch dimension so the whole
per-batch workload is a handful of large batched matmuls.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from msla_tpu.nn.attention import MultiHeadAttention
from msla_tpu.nn.layers import torch_bias_init, torch_kernel_init


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    #: compute dtype for the matmul-heavy blocks (params stay fp32)
    compute_dtype: str | None = None
    #: None → Pallas flash attention on TPU (ops.flash_attn), XLA elsewhere
    use_flash: bool | None = None

    # canonical bert-base-uncased special token ids (reference: bert.py:36-38
    # obtains them from BertTokenizer; the vocab is fixed so they are constants)
    pad_token_id: int = 0
    mask_token_id: int = 103


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.config
        b, s = input_ids.shape
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.compute_dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(s)[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=c.compute_dtype,
                       name="position_embeddings")(pos_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.compute_dtype,
                       name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + pos + tok
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype,
                         name="layer_norm")(x)
        return nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, attention_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        c = self.config
        drop = lambda a: nn.Dropout(c.hidden_dropout_prob)(a, deterministic=deterministic)

        # key-padding mask routes through ops.flash_attn: the Pallas flash
        # kernel on TPU (padded-QUERY rows differ there but the Audio-BERT
        # caller discards them), the identical XLA softmax chain elsewhere
        attn = MultiHeadAttention(c.hidden_size, c.num_attention_heads,
                                  dtype=c.compute_dtype, use_flash=c.use_flash,
                                  name="attention")(x, x, x, kv_mask=attention_mask,
                                                    deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype,
                         name="attention_norm")(x + drop(attn))

        h = nn.Dense(c.intermediate_size, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(c.hidden_size), dtype=c.compute_dtype,
                     name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)  # HF BERT uses erf-gelu
        h = nn.Dense(c.hidden_size, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(c.intermediate_size), dtype=c.compute_dtype,
                     name="output")(h)
        if not c.compute_dtype:  # bf16 mode keeps the residual stream bf16
            h = h.astype(jnp.float32)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype,
                            name="output_norm")(x + drop(h))


class BertForMaskedLM(nn.Module):
    config: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array | None = None,
                 deterministic: bool = True, return_mlm_hidden: bool = False) -> jax.Array:
        """(B, S) int ids → (B, S, vocab) MLM logits.

        return_mlm_hidden=True stops after the MLM transform+norm and returns
        the (B, S, hidden) states instead — callers that only need the argmax
        token (Audio-BERT, reference bert.py:67) fuse the tied-decoder matmul
        with the argmax via ops.mlm_argmax and never materialize the logits.
        """
        c = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        attention_mask = attention_mask.astype(jnp.float32)

        embeddings = BertEmbeddings(c, name="embeddings")
        x = embeddings(input_ids, deterministic=deterministic)
        for i in range(c.num_hidden_layers):
            x = BertLayer(c, name=f"layer{i}")(x, attention_mask,
                                               deterministic=deterministic)

        # MLM head: transform + tied decoder
        h = nn.Dense(c.hidden_size, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(c.hidden_size), name="mlm_transform")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype,
                         name="mlm_norm")(h)
        if return_mlm_hidden:
            return h
        word_embeddings = embeddings.variables["params"]["word_embeddings"]["embedding"]
        logits = jax.lax.dot_general(h, word_embeddings,
                                     (((2,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        bias = self.param("mlm_bias", nn.initializers.zeros, (c.vocab_size,))
        return logits + bias

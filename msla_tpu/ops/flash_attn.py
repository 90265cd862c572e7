"""Flash attention for the Audio-BERT encoder (key-padding mask case).

The Audio-BERT hot loop runs bert-base over 512-token chunks (reference:
src/model/bert.py:53-69). At that shape the XLA attention chain materializes
the (B, H, 512, 512) fp32 score tensor in HBM around the softmax — measured
1.98 ms per layer at batch 16 vs 1.10 ms for the Pallas TPU flash-attention
kernel shipped with JAX (tools/bench_flash_attn.py), which keeps score blocks
in VMEM with an online softmax.

Semantics note: the reference (HF BertSelfAttention) masks KEYS only — padded
queries still attend real keys and produce garbage rows that the caller
discards. The flash path expresses padding with segment ids (pad queries
attend pad keys instead), so outputs differ ONLY at padded query positions;
real rows match the XLA chain to bf16 tolerance (asserted on TPU by the bench
tool and in interpret mode by tests/test_flash_attn.py).

`use_flash=None` → flash kernel on TPU, XLA chain elsewhere (the same
auto-dispatch rule as ops.mlm_argmax).
"""
from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

_MIN_SEQ = 128  # the TPU kernel needs at least one full lane tile per block
_warned_fallback = False  # one-time warning when the flash path bails at trace


def _xla_attention(q, k, v, kv_mask, sm_scale):
    """Reference math: batched matmul + fp32 softmax + batched matmul.

    Identical to the pre-flash MultiHeadAttention body so the CPU/parity
    paths are bit-stable with round 1.
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if kv_mask is not None:
        # additive key-padding bias (HF uses -10000 fp32; -1e9 same effect)
        scores = scores + (1.0 - kv_mask[:, None, None, :].astype(jnp.float32)) * -1e9
    weights = jax.nn.softmax(scores, axis=-1)  # fp32 for stability
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _flash(q, k, v, kv_mask, sm_scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    s = q.shape[2]
    bs = BlockSizes(block_q=s, block_k_major=s, block_k=s, block_b=1,
                    block_q_major_dkv=s, block_k_major_dkv=s,
                    block_k_dkv=s, block_q_dkv=s,
                    block_k_major_dq=s, block_k_dq=s, block_q_dq=s)
    seg = None
    if kv_mask is not None:
        ids = kv_mask.astype(jnp.int32)
        seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(q, k, v, segment_ids=seg, sm_scale=sm_scale,
                          block_sizes=bs, debug=False)
    return out.astype(jnp.float32)


def scaled_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     kv_mask: jax.Array | None = None,
                     sm_scale: float,
                     use_flash: bool | None = None) -> jax.Array:
    """softmax(q @ kᵀ · sm_scale + key_pad_bias) @ v, fp32 out.

    q/k/v: (B, H, S, D); kv_mask: optional (B, S) 1.0=attend / 0.0=pad.
    use_flash=None → Pallas flash kernel on TPU (seq ≥ 128), XLA elsewhere.
    Padded QUERY rows are unspecified under flash (see module docstring).
    """
    if use_flash is None:
        use_flash = jax.default_backend() not in ("cpu",)
    if use_flash and q.shape[2] >= _MIN_SEQ and q.shape[2] % _MIN_SEQ == 0:
        # Only TRACE-time failures (import drift, shape/dtype rejection) are
        # catchable here — under an outer jit the Mosaic compile happens later
        # and a compile-time kernel failure propagates to the caller, which is
        # the right behavior: a silently slow fallback would mask it.
        try:
            return _flash(q, k, v, kv_mask, float(sm_scale))
        except (ImportError, NotImplementedError, ValueError, TypeError,
                AssertionError) as err:  # the kernel rejects shapes via asserts
            global _warned_fallback
            if not _warned_fallback:  # pragma: no cover - kernel API drift
                _warned_fallback = True
                log.warning("flash attention unavailable at trace time (%s: %s)"
                            " — falling back to the XLA attention chain",
                            type(err).__name__, err)
    return _xla_attention(q, k, v, kv_mask, sm_scale)

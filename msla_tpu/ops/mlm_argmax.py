"""Fused MLM argmax: `argmax_v(h @ Eᵀ + b)` without materializing the logits.

The Audio-BERT hot loop (reference: src/model/bert.py:53-69) only consumes the
ARGMAX of the masked-LM logits — the (B, 512, 30522) logits tensor itself is
wasted HBM traffic (≈1 GB fp32 per chunk at batch 16, written by the decoder
matmul and immediately re-read by the argmax). This kernel tiles the vocab
axis, keeps each (TILE_M, TILE_V) logits block in VMEM, and carries a running
(max, argmax) — flash-attention-style online reduction — so only the int32
ids (and optionally the softmax confidence of the pick, via an online
logsumexp) ever reach HBM.

Tie-breaking matches `jnp.argmax` exactly: first (lowest-index) maximum wins —
within a block via masked-iota-min, across blocks via strict-greater updates.

A jnp fallback (plain dot + argmax) runs on CPU and anywhere Pallas is
unavailable; both paths are asserted equal in tests (interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (TILE_M, TILE_V) logits block ≈ 2 MB fp32; double-buffered inputs
# h (TILE_M, 768) + w (TILE_V, 768) fit the ~16 MB VMEM comfortably
DEFAULT_TILE_M = 512
DEFAULT_TILE_V = 1024
_OUT_SUBLANES = 8
_NEG_BIG = -1e30


def _block_top1(h, w, b, j, tile_v):
    """One (TILE_M, TILE_V) logits block → (block max, first-argmax, logits)."""
    logits = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = logits + b
    bm = jnp.max(logits, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tile_v
    bidx = jnp.min(jnp.where(logits >= bm, iota, jnp.int32(2 ** 30)),
                   axis=1, keepdims=True)
    return bm, bidx, logits


def _argmax_kernel(h_ref, w_ref, b_ref, ids_ref, best_val, best_idx):
    j = pl.program_id(1)
    bm, bidx, _ = _block_top1(h_ref[:], w_ref[:], b_ref[:], j, w_ref.shape[0])

    @pl.when(j == 0)
    def _init():
        best_val[:] = bm
        best_idx[:] = bidx

    @pl.when(j > 0)
    def _update():
        better = bm > best_val[:]  # strict: earlier block wins ties
        best_val[:] = jnp.where(better, bm, best_val[:])
        best_idx[:] = jnp.where(better, bidx, best_idx[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        ids_ref[:] = best_idx[:].reshape(ids_ref.shape)


def _argmax_conf_kernel(h_ref, w_ref, b_ref, ids_ref, conf_ref,
                        best_val, best_idx, run_max, run_sum):
    j = pl.program_id(1)
    bm, bidx, logits = _block_top1(h_ref[:], w_ref[:], b_ref[:], j, w_ref.shape[0])

    @pl.when(j == 0)
    def _init():
        best_val[:] = bm
        best_idx[:] = bidx
        run_max[:] = bm
        run_sum[:] = jnp.sum(jnp.exp(logits - bm), axis=1, keepdims=True)

    @pl.when(j > 0)
    def _update():
        better = bm > best_val[:]
        best_val[:] = jnp.where(better, bm, best_val[:])
        best_idx[:] = jnp.where(better, bidx, best_idx[:])
        new_max = jnp.maximum(run_max[:], bm)  # online logsumexp
        run_sum[:] = (run_sum[:] * jnp.exp(run_max[:] - new_max)
                      + jnp.sum(jnp.exp(logits - new_max), axis=1, keepdims=True))
        run_max[:] = new_max

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        ids_ref[:] = best_idx[:].reshape(ids_ref.shape)
        # softmax prob of the argmax pick: exp(max - logsumexp)
        lse = jnp.log(run_sum[:]) + run_max[:]
        conf_ref[:] = jnp.exp(best_val[:] - lse).reshape(conf_ref.shape)


@functools.partial(jax.jit, static_argnames=("with_conf", "tile_m", "tile_v",
                                             "interpret"))
def mlm_argmax_pallas(h: jax.Array, emb: jax.Array, bias: jax.Array,
                      with_conf: bool = False,
                      tile_m: int = DEFAULT_TILE_M, tile_v: int = DEFAULT_TILE_V,
                      interpret: bool = False):
    """h (M, K) × emb (V, K) + bias (V,) → argmax ids (M,) [+ confidence (M,)]."""
    m, k = h.shape
    v = emb.shape[0]
    if m < tile_m:
        tile_m = max(_OUT_SUBLANES, -(-m // _OUT_SUBLANES) * _OUT_SUBLANES)
    m_tiles = pl.cdiv(m, tile_m)
    v_tiles = pl.cdiv(v, tile_v)
    m_pad, v_pad = m_tiles * tile_m, v_tiles * tile_v
    lanes = tile_m // _OUT_SUBLANES

    if m_pad != m:
        h = jnp.pad(h, ((0, m_pad - m), (0, 0)))
    if v_pad != v:
        emb = jnp.pad(emb, ((0, v_pad - v), (0, 0)))
        # padded vocab rows can never win the argmax nor contribute to the lse
        bias = jnp.pad(bias, (0, v_pad - v), constant_values=_NEG_BIG)
    bias2 = bias.astype(jnp.float32)[None, :]

    grid = (m_tiles, v_tiles)  # v innermost: running reduction in scratch
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((_OUT_SUBLANES, lanes), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m_tiles * _OUT_SUBLANES, lanes), jnp.int32)
    scratch = [pltpu.VMEM((tile_m, 1), jnp.float32),
               pltpu.VMEM((tile_m, 1), jnp.int32)]
    cost = pl.CostEstimate(flops=2 * m_pad * v_pad * k,
                           bytes_accessed=m_tiles * v_pad * k * emb.dtype.itemsize
                           + m_pad * k * h.dtype.itemsize + m_pad * 4,
                           transcendentals=m_pad * v_pad if with_conf else 0)

    if with_conf:
        ids, conf = pl.pallas_call(
            _argmax_conf_kernel,
            grid=grid, in_specs=in_specs,
            out_specs=[out_spec, pl.BlockSpec((_OUT_SUBLANES, lanes),
                                              lambda i, j: (i, 0),
                                              memory_space=pltpu.VMEM)],
            out_shape=[out_shape,
                       jax.ShapeDtypeStruct((m_tiles * _OUT_SUBLANES, lanes),
                                            jnp.float32)],
            scratch_shapes=scratch + [pltpu.VMEM((tile_m, 1), jnp.float32),
                                      pltpu.VMEM((tile_m, 1), jnp.float32)],
            cost_estimate=cost, interpret=interpret,
        )(h, emb, bias2)
        return ids.reshape(-1)[:m], conf.reshape(-1)[:m]

    ids = pl.pallas_call(
        _argmax_kernel,
        grid=grid, in_specs=in_specs, out_specs=out_spec, out_shape=out_shape,
        scratch_shapes=scratch, cost_estimate=cost, interpret=interpret,
    )(h, emb, bias2)
    return ids.reshape(-1)[:m]


def _mlm_argmax_jnp(h, emb, bias, with_conf):
    logits = jax.lax.dot_general(h, emb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not with_conf:
        return ids
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    conf = jnp.exp(jnp.max(logits, axis=-1) - lse)
    return ids, conf


def mlm_argmax(h: jax.Array, emb: jax.Array, bias: jax.Array, *,
               with_conf: bool = False, use_pallas: bool | None = None):
    """argmax over the tied-decoder logits `h @ embᵀ + bias`.

    h: (..., K) hidden states; emb: (V, K) tied word embeddings; bias: (V,).
    Returns int32 ids shaped like h[..., 0] (plus fp32 confidences when
    with_conf). use_pallas=None → fused kernel on TPU, jnp elsewhere.
    """
    lead = h.shape[:-1]
    h2 = h.reshape(-1, h.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        try:
            out = mlm_argmax_pallas(h2, emb, bias, with_conf=with_conf)
        except Exception:  # pragma: no cover - kernel unsupported → fallback
            out = _mlm_argmax_jnp(h2, emb, bias, with_conf)
    else:
        out = _mlm_argmax_jnp(h2, emb, bias, with_conf)
    if with_conf:
        ids, conf = out
        return ids.reshape(lead), conf.reshape(lead)
    return out.reshape(lead)

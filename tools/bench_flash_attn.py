#!/usr/bin/env python
"""Prototype: built-in Pallas TPU flash attention vs the XLA attention chain
at Audio-BERT shape — (B=16, H=12, S=512, D=64), bf16.

Motivation (PERFORMANCE.md BERT roofline): the XLA path materializes the
(B, H, 512, 512) fp32 score tensor per layer per chunk (~201 MB), written and
re-read around the softmax — ×12 layers ×22 chunks that is ~100+ GB of HBM
traffic per train step. Flash attention keeps score blocks in VMEM.

Measured via the fori_loop-on-device methodology (CLAUDE.md: host timing
through the axon tunnel under-reports).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, SegmentIds, flash_attention)

B, H, S, D = 16, 12, 512, 64
ITERS = 30
SCALE = 1.0 / np.sqrt(D)


def loop_time(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def step(i, carry):
            out = fn(carry, *a)
            return carry + out
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def xla_attn(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    # padding mask: last 264 keys padded (the 22nd Audio-BERT chunk)
    am = np.ones((B, S), np.float32)
    am[:, 248:] = 0.0
    am = jnp.asarray(am)
    bias = (1.0 - am[:, None, None, :]) * -1e9
    seg = SegmentIds(q=am.astype(jnp.int32), kv=am.astype(jnp.int32))

    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=512,
                    block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=512, block_k_dq=512, block_q_dq=512)

    # numerics: real (unpadded-key) outputs must match
    ref = np.asarray(xla_attn(q, k, v, bias), np.float32)
    fl = np.asarray(flash_attention(q, k, v, segment_ids=seg, sm_scale=SCALE,
                                    block_sizes=bs), np.float32)
    diff = np.abs(ref - fl).max()
    print(f"max|xla - flash| over all positions: {diff:.3e}")

    def run_xla(c, q, k, v, bias):
        out = xla_attn(q + c * 1e-12, k, v, bias)
        return out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

    def run_flash(c, q, k, v):
        out = flash_attention(q + c.astype(q.dtype) * 1e-12, k, v,
                              segment_ids=seg, sm_scale=SCALE, block_sizes=bs)
        return out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

    def run_flash_nomask(c, q, k, v):
        out = flash_attention(q + c.astype(q.dtype) * 1e-12, k, v,
                              sm_scale=SCALE, block_sizes=bs)
        return out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

    t_xla = loop_time(run_xla, q, k, v, bias)
    t_fl = loop_time(run_flash, q, k, v)
    t_fl0 = loop_time(run_flash_nomask, q, k, v)
    print(f"xla attention     : {t_xla:7.3f} ms")
    print(f"flash (segment_ids): {t_fl:7.3f} ms")
    print(f"flash (no mask)    : {t_fl0:7.3f} ms")
    print(f"per-step estimate (x12 layers x22 chunks): "
          f"xla {t_xla*264:.0f} ms vs flash {t_fl*264:.0f} ms")


if __name__ == "__main__":
    main()

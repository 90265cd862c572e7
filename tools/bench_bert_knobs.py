#!/usr/bin/env python
"""Tune the two BERT kernels at the FOLDED shapes (352 sequences per call):

1. ops.mlm_argmax tile_m — at M=180224 each m-tile re-streams the whole
   (30522, 768) embedding matrix (47 MB bf16): 352 tiles × 47 MB ≈ 16.6 GB of
   HBM traffic per step at tile_m=512; 2048 cuts it to ~4 GB.
2. the flash-attention kernel's block_b at (352, 12, 512, 64).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

M, K, V = 352 * 512, 768, 30522
B, H, S, D = 352, 12, 512, 64
ITERS = 20


def loop_time(fn, *args, iters=ITERS):
    @jax.jit
    def loop(*a):
        def step(i, carry):
            return carry + fn(carry, *a)
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_argmax():
    from msla_tpu.ops.mlm_argmax import mlm_argmax_pallas

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    emb = jnp.asarray(rng.standard_normal((V, K)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)

    ref = None
    for tile_m in (512, 1024, 2048, 4096):
        for tile_v in (1024, 2048):
            def body(c, h, emb, bias, tm=tile_m, tv=tile_v):
                ids = mlm_argmax_pallas(h + c.astype(h.dtype) * 1e-12, emb, bias,
                                        tile_m=tm, tile_v=tv)
                return ids[0].astype(jnp.float32) * 1e-12
            try:
                t = loop_time(body, h, emb, bias)
                ids = mlm_argmax_pallas(h, emb, bias, tile_m=tile_m, tile_v=tile_v)
                if ref is None:
                    ref = np.asarray(ids)
                ok = bool((np.asarray(ids) == ref).all())
                print(f"mlm_argmax tile_m={tile_m} tile_v={tile_v}: {t:7.2f} ms  match={ok}")
            except Exception as e:
                print(f"mlm_argmax tile_m={tile_m} tile_v={tile_v}: FAILED {str(e)[:100]}")


def bench_flash_blockb():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    am = np.ones((B, S), np.float32)
    am[-16:, 248:] = 0.0  # last folded chunk padded
    seg = SegmentIds(q=jnp.asarray(am, jnp.int32), kv=jnp.asarray(am, jnp.int32))

    for block_b in (1, 2, 4, 8):
        bs = BlockSizes(block_q=S, block_k_major=S, block_k=S, block_b=block_b,
                        block_q_major_dkv=S, block_k_major_dkv=S,
                        block_k_dkv=S, block_q_dkv=S,
                        block_k_major_dq=S, block_k_dq=S, block_q_dq=S)

        def body(c, q, k, v, bs=bs):
            out = flash_attention(q + c.astype(q.dtype) * 1e-12, k, v,
                                  segment_ids=seg, sm_scale=0.125, block_sizes=bs)
            return out[0, 0, 0, 0].astype(jnp.float32) * 1e-12
        try:
            t = loop_time(body, q, k, v)
            print(f"flash block_b={block_b}: {t:7.2f} ms")
        except Exception as e:
            print(f"flash block_b={block_b}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_argmax()
    bench_flash_blockb()

#!/usr/bin/env python
"""TPU bench: fused VQ (ops/vq_fused) vs jnp VQ at reference scale
(N = 64·11000 = 704k positions, 512×64 codebook), fwd WITH perplexity
consumed (no DCE) and fwd+bwd.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_vq_fused.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.ops.vq import _vector_quantize_fused, vector_quantize

N, D, K = 64 * 11000, 64, 512
ITERS = 10
BETA = 0.25


def loop_time(body, *args):
    @jax.jit
    def loop(*a):
        def step(i, carry):
            return carry + body(carry, *a)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 11000, D)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)

    def consume(r):
        # touch every training-consumed output (losses + perplexity + STE)
        return (r.embedding_loss + r.commitment_loss + r.perplexity
                + r.quantized_ste[0, 0, 0]) * 1e-9

    # jnp without perplexity (scatter DCE'd) — isolates the scatter cost
    def consume_np(r):
        return (r.embedding_loss + r.commitment_loss + r.quantized_ste[0, 0, 0]) * 1e-9

    t = loop_time(lambda c, xx, cbk: consume_np(
        vector_quantize(xx + c * 1e-12, cbk, BETA, use_pallas=False)), x, cb)
    print(f"vq jnp   fwd (no perplexity): {t*1e3:7.2f} ms", flush=True)

    for name, fn in [("jnp", lambda x, cb: vector_quantize(x, cb, BETA,
                                                           use_pallas=False)),
                     ("fused", lambda x, cb: _vector_quantize_fused(x, cb, BETA))]:
        t = loop_time(lambda c, xx, cbk: consume(fn(xx + c * 1e-12, cbk)), x, cb)
        print(f"vq {name:<5s} fwd (all outputs): {t*1e3:7.2f} ms", flush=True)

        def loss(xx, cbk):
            r = fn(xx, cbk)
            return (r.embedding_loss + r.commitment_loss
                    + r.quantized_ste.sum() * 1e-9 + r.perplexity * 0.0)

        g = jax.grad(loss, argnums=(0, 1))
        t = loop_time(lambda c, xx, cbk: g(xx + c * 1e-12, cbk)[1][0, 0] * 1e-9,
                      x, cb)
        print(f"vq {name:<5s} fwd+bwd          : {t*1e3:7.2f} ms", flush=True)

    # numerical cross-check on device
    a = _vector_quantize_fused(x, cb, BETA)
    b = vector_quantize(x, cb, BETA, use_pallas=False)
    print("idx equal:", bool(jnp.all(a.encoding_indices == b.encoding_indices)),
          "| perp diff:", float(jnp.abs(a.perplexity - b.perplexity)),
          "| loss diff:", float(jnp.abs(a.embedding_loss - b.embedding_loss)))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Focused TPU bench: MLM decoder matmul + argmax, XLA logits path vs the
fused Pallas kernel (ops/mlm_argmax.py), at the Audio-BERT per-chunk shape
M = 16*512 = 8192 rows, K = 768, V = 30522.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_mlm_head.py [bf16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.ops.mlm_argmax import _mlm_argmax_jnp, mlm_argmax_pallas

M, K, V = 8192, 768, 30522
ITERS = 20


def loop_time(make_body, *args):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            return carry + make_body(*a, carry)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))  # compile+warm
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    dt = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((M, K)), dt)
    emb = jnp.asarray(rng.standard_normal((V, K)), dt)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)

    def xla_body(h, emb, bias, carry):
        ids = _mlm_argmax_jnp(h + carry * jnp.asarray(1e-12, dt), emb, bias, False)
        return ids[0].astype(jnp.float32)

    def pallas_body(h, emb, bias, carry):
        ids = mlm_argmax_pallas(h + carry * jnp.asarray(1e-12, dt), emb, bias)
        return ids[0].astype(jnp.float32)

    def pallas_conf_body(h, emb, bias, carry):
        ids, conf = mlm_argmax_pallas(h + carry * jnp.asarray(1e-12, dt), emb, bias,
                                      with_conf=True)
        return ids[0].astype(jnp.float32) + conf[0]

    t_x = loop_time(xla_body, h, emb, bias)
    print(f"xla logits+argmax   ({dt.__name__}): {t_x*1e3:7.2f} ms "
          f"({2*M*V*K/t_x/1e12:.1f} TF/s)")
    t_p = loop_time(pallas_body, h, emb, bias)
    print(f"pallas fused argmax ({dt.__name__}): {t_p*1e3:7.2f} ms "
          f"({2*M*V*K/t_p/1e12:.1f} TF/s)")
    t_c = loop_time(pallas_conf_body, h, emb, bias)
    print(f"pallas fused + conf ({dt.__name__}): {t_c*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

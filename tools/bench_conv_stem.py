#!/usr/bin/env python
"""TPU bench: fused conv/deconv stem kernels vs XLA at reference scale
(B=64, T=44000, 4→64→128 channels encoder; 128→64→4 decoder; k4 s2 p1).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_conv_stem.py [bf16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from msla_tpu.ops.conv_stem import conv_stem_pallas, conv_stem_ref, _conv_stem_fused
from msla_tpu.ops.deconv_stem import (deconv_stem_pallas, deconv_stem_ref,
                                      _deconv_stem_fused)

B, T, C0, C1, C2 = 64, 44000, 4, 64, 128
ITERS = 10
TILES = (1000, 2200)  # multiples of 8 dividing 11000 (Mosaic block rule)


def loop_time(body):
    @jax.jit
    def loop():
        def step(i, carry):
            return carry + body(carry)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    float(loop())
    t0 = time.perf_counter()
    float(loop())
    return (time.perf_counter() - t0) / ITERS


def main():
    dt = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C0)), dt)
    w1 = jnp.asarray(rng.standard_normal((4, C0, C1)) * 0.1, dt)
    b1 = jnp.asarray(rng.standard_normal((C1,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4, C1, C2)) * 0.1, dt)
    b2 = jnp.asarray(rng.standard_normal((C2,)) * 0.1, jnp.float32)

    dep = lambda carry: (carry.astype(dt) * jnp.asarray(1e-12, dt))

    t = loop_time(lambda c: conv_stem_ref(x + dep(c), w1, b1, w2, b2)[0]
                  [0, 0, 0].astype(jnp.float32))
    print(f"enc xla ref fwd       ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    for tile in TILES:
        t = loop_time(lambda c: conv_stem_pallas(x + dep(c), w1, b1, w2, b2,
                                                 tile_w=tile)
                      [0, 0, 0].astype(jnp.float32))
        print(f"enc pallas fwd t={tile:<5d}({dt.__name__}): {t*1e3:7.2f} ms",
              flush=True)

    g_ref = jax.grad(lambda xx, w1, b1, w2, b2:
                     conv_stem_ref(xx, w1, b1, w2, b2)[0].astype(jnp.float32).sum(),
                     argnums=(0, 1, 2, 3, 4))
    t = loop_time(lambda c: g_ref(x + dep(c), w1, b1, w2, b2)[1]
                  [0, 0, 0].astype(jnp.float32))
    print(f"enc xla ref fwd+bwd   ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    g_fus = jax.grad(lambda xx, w1, b1, w2, b2:
                     _conv_stem_fused(xx, w1, b1, w2, b2).astype(jnp.float32).sum(),
                     argnums=(0, 1, 2, 3, 4))
    t = loop_time(lambda c: g_fus(x + dep(c), w1, b1, w2, b2)[1]
                  [0, 0, 0].astype(jnp.float32))
    print(f"enc pallas fwd+bwd    ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    a = conv_stem_pallas(x, w1, b1, w2, b2)
    bref = conv_stem_ref(x, w1, b1, w2, b2)[0]
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bref.astype(jnp.float32))))
    print(f"enc max |pallas - ref| = {err:.2e}", flush=True)

    # ---- decoder stem: (B, 11000, 128) → (B, 44000, 4) ----
    w = T // 4
    q = jnp.asarray(rng.standard_normal((B, w, C2)), dt)
    k1 = jnp.asarray(rng.standard_normal((4, C1, C2)) * 0.1, dt)
    db1 = jnp.asarray(rng.standard_normal((C1,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((4, 4, C1)) * 0.1, dt)
    db2 = jnp.asarray(rng.standard_normal((4,)) * 0.1, jnp.float32)

    t = loop_time(lambda c: deconv_stem_ref(q + dep(c), k1, db1, k2, db2)[0]
                  [0, 0, 0].astype(jnp.float32))
    print(f"dec xla ref fwd       ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    for tile in TILES:
        t = loop_time(lambda c: deconv_stem_pallas(q + dep(c), k1, db1, k2, db2,
                                                   tile_w=tile)
                      [0, 0, 0].astype(jnp.float32))
        print(f"dec pallas fwd t={tile:<5d}({dt.__name__}): {t*1e3:7.2f} ms",
              flush=True)

    gd_ref = jax.grad(lambda qq, k1, b1, k2, b2:
                      deconv_stem_ref(qq, k1, b1, k2, b2)[0].astype(jnp.float32).sum(),
                      argnums=(0, 1, 2, 3, 4))
    t = loop_time(lambda c: gd_ref(q + dep(c), k1, db1, k2, db2)[1]
                  [0, 0, 0].astype(jnp.float32))
    print(f"dec xla ref fwd+bwd   ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    gd_fus = jax.grad(lambda qq, k1, b1, k2, b2:
                      _deconv_stem_fused(qq, k1, b1, k2, b2).astype(jnp.float32).sum(),
                      argnums=(0, 1, 2, 3, 4))
    t = loop_time(lambda c: gd_fus(q + dep(c), k1, db1, k2, db2)[1]
                  [0, 0, 0].astype(jnp.float32))
    print(f"dec pallas fwd+bwd    ({dt.__name__}): {t*1e3:7.2f} ms", flush=True)

    a = deconv_stem_pallas(q, k1, db1, k2, db2)
    bref = deconv_stem_ref(q, k1, db1, k2, db2)[0]
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bref.astype(jnp.float32))))
    print(f"dec max |pallas - ref| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

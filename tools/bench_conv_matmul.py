#!/usr/bin/env python
"""TPU bench: XLA conv vs explicit patches-matmul formulations of the VQ-VAE
stem layers (k4 s2 p1 conv and conv-transpose).

PERFORMANCE.md: XLA runs the encoder stem (conv1+conv2) at 3.29 ms fwd bf16
vs a ~0.25 ms single-pass MXU floor, and the hand-written Pallas stems lose
to XLA. This probes a third option: keep XLA, but hand it plain dots —
  conv k4s2   → 4 strided slices of the padded input concatenated to
                (B, W, 4C), one (4C → Cout) matmul
  convT k4s2  → two k2-phase matmuls (even/odd output phases) interleaved
If XLA's conv lowering is the bottleneck (not the memory traffic), the dot
formulation should approach the matmul roofline.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_conv_matmul.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T = 64, 44000
C1, C2 = 64, 128
ITERS = 10


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


def conv_nwc(x, w, stride):
    """lax conv, NWC x, (k, Cin, Cout) w, padding 1 (the stem config)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))


def conv_k4s2_matmul(x, w):
    """k4 s2 p1 conv as one (4C → Cout) matmul over stacked strided slices."""
    b, t, c = x.shape
    wout = t // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, j, j + 2 * (wout - 1) + 1, stride=2, axis=1)
         for j in range(4)], axis=-1)                       # (B, W, 4C)
    return patches @ w.reshape(4 * c, -1)                   # w: (4, C, Cout)


def convt_k4s2_matmul(x, w):
    """convT k4 s2 p1 as two k2-phase matmuls + interleave.

    y[2n]   = x[n]·W[1] + x[n-1]·W[3]
    y[2n+1] = x[n+1]·W[0] + x[n]·W[2]      (w: (k=4, Cout, Cin) torch order)
    """
    b, t, c = x.shape
    cout = w.shape[1]
    wt = jnp.transpose(w, (0, 2, 1))                        # (4, Cin, Cout)
    xm1 = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]      # x[n-1]
    xp1 = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:]       # x[n+1]
    y_even = x @ wt[1] + xm1 @ wt[3]
    y_odd = xp1 @ wt[0] + x @ wt[2]
    return jnp.stack([y_even, y_odd], axis=2).reshape(b, 2 * t, cout)


def convt_nwc(x, w, stride=2):
    """Reference conv-transpose via dilated conv (torch w: (k, Cout, Cin))."""
    wr = jnp.flip(w, 0)                                     # (k, Cout, Cin)
    wr = jnp.transpose(wr, (0, 2, 1))                       # (k, Cin, Cout) IO
    return jax.lax.conv_general_dilated(
        x, wr, window_strides=(1,), padding=[(2, 2)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_msla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)

    # ---- correctness (fp32, small) ----
    xs = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((4, 8, 16)), jnp.float32)
    a = conv_nwc(xs, ws, 2)
    bm = conv_k4s2_matmul(xs, ws)
    print("conv k4s2 matmul max err:", float(jnp.max(jnp.abs(a - bm))))
    wt = jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32)  # (k,Cout,Cin)
    at = convt_nwc(xs, wt)
    bt = convt_k4s2_matmul(xs, wt)
    print("convT shapes", at.shape, bt.shape,
          "max err:", float(jnp.max(jnp.abs(at - bt))))

    # ---- timing (bf16, reference scale) ----
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, T, 4)), jnp.float32).astype(dt)
    w1 = jnp.asarray(rng.standard_normal((4, 4, C1)) * 0.1, jnp.float32).astype(dt)
    w2 = jnp.asarray(rng.standard_normal((4, C1, C2)) * 0.1, jnp.float32).astype(dt)

    def stem_xla(c, x, w1, w2):
        h = jax.nn.relu(conv_nwc(x + c.astype(dt) * 1e-8, w1, 2))
        h = jax.nn.relu(conv_nwc(h, w2, 2))
        return h[0, 0, 0].astype(jnp.float32) * 1e-9

    def stem_mm(c, x, w1, w2):
        h = jax.nn.relu(conv_k4s2_matmul(x + c.astype(dt) * 1e-8, w1))
        h = jax.nn.relu(conv_k4s2_matmul(h, w2))
        return h[0, 0, 0].astype(jnp.float32) * 1e-9

    for name, fn in [("xla ", stem_xla), ("mm  ", stem_mm)]:
        t = loop_time(fn, x, w1, w2)
        print(f"encoder stem fwd {name}: {t*1e3:7.2f} ms", flush=True)
        g = jax.grad(lambda xx, a1, a2: fn(jnp.float32(0), xx, a1, a2) * 1e9,
                     argnums=(1, 2))

        def bwd_body(c, xx, a1, a2):
            g1, g2 = g(xx + c.astype(dt) * 1e-8, a1, a2)
            return g1[0, 0, 0].astype(jnp.float32) * 1e-9

        t = loop_time(bwd_body, x, w1, w2)
        print(f"encoder stem fwd+bwd {name}: {t*1e3:7.2f} ms", flush=True)

    # decoder stems: W=11000 C2→C1 then C1→4 (both convT k4s2p1)
    q = jnp.asarray(rng.standard_normal((B, T // 4, C2)), jnp.float32).astype(dt)
    v1 = jnp.asarray(rng.standard_normal((4, C1, C2)) * 0.1, jnp.float32).astype(dt)
    v2 = jnp.asarray(rng.standard_normal((4, 4, C1)) * 0.1, jnp.float32).astype(dt)

    def dec_xla(c, q, v1, v2):
        h = jax.nn.relu(convt_nwc(q + c.astype(dt) * 1e-8, v1))
        h = convt_nwc(h, v2)
        return h[0, 0, 0].astype(jnp.float32) * 1e-9

    def dec_mm(c, q, v1, v2):
        h = jax.nn.relu(convt_k4s2_matmul(q + c.astype(dt) * 1e-8, v1))
        h = convt_k4s2_matmul(h, v2)
        return h[0, 0, 0].astype(jnp.float32) * 1e-9

    for name, fn in [("xla ", dec_xla), ("mm  ", dec_mm)]:
        t = loop_time(fn, q, v1, v2)
        print(f"decoder stem fwd {name}: {t*1e3:7.2f} ms", flush=True)
        g = jax.grad(lambda qq, a1, a2: fn(jnp.float32(0), qq, a1, a2) * 1e9,
                     argnums=(1, 2))

        def bwd_body(c, qq, a1, a2):
            g1, g2 = g(qq + c.astype(dt) * 1e-8, a1, a2)
            return g1[0, 0, 0].astype(jnp.float32) * 1e-9

        t = loop_time(bwd_body, q, v1, v2)
        print(f"decoder stem fwd+bwd {name}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

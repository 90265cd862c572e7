"""Probe: do int8 convs beat bf16 on v5e for the VQ-VAE's shapes?

The roofline (tools/roofline.py) says the separation composite is
HBM-bandwidth-bound; int8 activations halve byte traffic vs bf16, so IF XLA
lowers int8 `conv_general_dilated` natively on the MXU (394 TOPS int8 on
v5e), a quantized serving path could approach 2× on the bound stages. This
measures the raw conv at the encoder's dominant shapes in f32/bf16/int8
before any quantized-serving engineering is committed.

Run (TPU): python tools/bench_int8_conv.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
# encoder conv2: (B, W, C_in) x k4s2 -> (B, W/2, C_out) — the widest hot conv
B, W, CIN, COUT, K, STRIDE = 64, 22000, 64, 128, 4, 2
DN = ("NWC", "WIO", "NWC")


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(STRIDE,), padding=[(1, 1)],
        dimension_numbers=DN,
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32)


def main():
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((B, W, CIN)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((K, CIN, COUT)) * 0.1, jnp.float32)
    x16, k16 = x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, W, CIN)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (K, CIN, COUT)), jnp.int8)

    f = jax.jit(conv)
    results = {}
    for name, (x, k) in [("f32", (x32, k32)), ("bf16", (x16, k16)),
                         ("int8", (x8, k8))]:
        try:
            results[name] = timed(f, x, k)
        except Exception as err:
            results[name] = f"FAILED: {type(err).__name__}: {err}"

    # int8 with fused dequant epilogue (the realistic serving graph):
    # int32 accum * (sx*sw) scale → f32, +bias, relu, requantize to int8
    sx = jnp.float32(0.05)
    sw = jnp.float32(0.01)
    bias = jnp.asarray(rng.standard_normal(COUT), jnp.float32)

    @jax.jit
    def int8_epilogue(x, k):
        acc = conv(x, k).astype(jnp.float32) * (sx * sw) + bias
        y = jnp.maximum(acc, 0.0)
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
        return jnp.clip(jnp.round(y * s), -127, 127).astype(jnp.int8)

    try:
        results["int8+epilogue"] = timed(int8_epilogue, x8, k8)
    except Exception as err:
        results["int8+epilogue"] = f"FAILED: {type(err).__name__}: {err}"

    print(f"conv shapes: x=({B},{W},{CIN}) k=({K},{CIN},{COUT}) s{STRIDE} "
          f"[{ITERS} iters]")
    for name, ms in results.items():
        print(f"  {name:>14}: {ms if isinstance(ms, str) else f'{ms:.2f} ms'}")


if __name__ == "__main__":
    main()

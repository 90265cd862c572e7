"""Probe: do int8 convs beat bf16 on v5e for the VQ-VAE's shapes?

The roofline (tools/roofline.py) says the separation composite is
HBM-bandwidth-bound; int8 activations halve byte traffic vs bf16, so IF XLA
lowers int8 `conv_general_dilated` natively on the MXU (394 TOPS int8 on
v5e), a quantized serving path could approach 2× on the bound stages.

Methodology: CLAUDE.md's tunnel rules — each variant loops ITERS iterations
ON-DEVICE inside one jit (`lax.fori_loop` with a loop-carried data
dependency threading the previous output into the next input) and fetches a
single scalar, so per-call tunnel overhead is amortized and nothing is
DCE'd. The f32/bf16/int8 numbers are therefore directly comparable.

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

ITERS = 50
# encoder conv2: (B, W, C_in) x k4s2 -> (B, W/2, C_out) — the widest hot conv
B, W, CIN, COUT, K, STRIDE = 64, 22000, 64, 128, 4, 2
DN = ("NWC", "WIO", "NWC")


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(STRIDE,), padding=[(1, 1)],
        dimension_numbers=DN,
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32)


def loop_time(body, *args):
    """sec/iter of body(carry, *args) -> scalar f32, looped on-device."""
    @jax.jit
    def loop(*a):
        def step(i, carry):
            return carry + body(carry, *a)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((B, W, CIN)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((K, CIN, COUT)) * 0.1, jnp.float32)
    x16, k16 = x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, W, CIN)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (K, CIN, COUT)), jnp.int8)

    def f32_body(carry, x, k):
        y = conv(x + carry * 1e-12, k)
        return y[0, 0, 0] * 1e-12

    def bf16_body(carry, x, k):
        y = conv(x + carry.astype(jnp.bfloat16) * 1e-6, k)
        return y[0, 0, 0].astype(jnp.float32) * 1e-12

    def int8_body(carry, x, k):
        # loop-carry an int8 perturbation of one element so iterations chain
        delta = (carry.astype(jnp.int32) % 2).astype(jnp.int8)
        y = conv(x.at[0, 0, 0].add(delta), k)
        return y[0, 0, 0].astype(jnp.float32) * 1e-12

    def int8_epilogue_body(carry, x, k):
        # realistic serving graph: int32 accum → dequant → bias/relu →
        # dynamic per-tensor requant (global max) → int8 for the next layer
        delta = (carry.astype(jnp.int32) % 2).astype(jnp.int8)
        acc = conv(x.at[0, 0, 0].add(delta), k).astype(jnp.float32)
        ybias = jnp.maximum(acc * 5e-4 + 0.01, 0.0)
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(ybias)), 1e-6)
        q = jnp.clip(jnp.round(ybias * s), -127, 127).astype(jnp.int8)
        return q[0, 0, 0].astype(jnp.float32) * 1e-12

    results = {}
    for name, body, a in [("f32", f32_body, (x32, k32)),
                          ("bf16", bf16_body, (x16, k16)),
                          ("int8", int8_body, (x8, k8)),
                          ("int8+epilogue", int8_epilogue_body, (x8, k8))]:
        try:
            results[name] = loop_time(body, *a) * 1e3
        except Exception as err:
            results[name] = f"FAILED: {type(err).__name__}: {err}"

    print(f"conv shapes: x=({B},{W},{CIN}) k=({K},{CIN},{COUT}) s{STRIDE} "
          f"[{ITERS} on-device iters per jit]")
    for name, ms in results.items():
        print(f"  {name:>14}: {ms if isinstance(ms, str) else f'{ms:.3f} ms'}")


if __name__ == "__main__":
    main()

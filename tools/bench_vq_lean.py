#!/usr/bin/env python
"""TPU bench: 'lean' fused-VQ forward vs the shipping ops/vq_fused kernel.

Idea: the fwd kernel's one-hot quantize matmul (704k×512×64 fp32, MXU) and
the diff-squared VPU pass exist only to produce `quantized` and the shared
‖q−x‖² sum. Both are derivable more cheaply:
  ‖q−x‖²  =  ‖x‖² + min_k(‖cb_k‖² − 2·x·cb_k)   (exact algebra)
  quantized = cb[idx]  — an XLA gather OUTSIDE the kernel (its VJP never
  materializes: the custom VJP owns the backward already).
The lean kernel emits idx, counts, sq only. Numerics check: the m+‖x‖² form
is cancellation-prone per element (operands ~‖x‖² vs result ~0 when q≈x),
so the loss sum is compared against the exact diff² form at BOTH random and
near-converged (q≈x) codebook regimes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_vq_lean.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 64 * 11000, 64, 512
TILE = 2048
ITERS = 10


def _lean_kernel(n_valid, tile, x_ref, cb_ref, e2_ref, idx_ref,
                 counts_ref, sq_ref, counts_acc, sq_acc):
    i = pl.program_id(0)
    x = x_ref[:]
    dots = lax.dot_general(x, cb_ref[:], (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    dist = e2_ref[:] - 2.0 * dots
    m = jnp.min(dist, axis=1, keepdims=True)
    lane = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx = jnp.min(jnp.where(dist <= m, lane, dist.shape[1]), axis=1,
                  keepdims=True)
    row = i * tile + lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    valid = (row < n_valid).astype(jnp.float32)
    onehot = (lane == idx).astype(jnp.float32)
    idx_ref[:] = idx
    # ‖q−x‖² = ‖x‖² + dist_min (algebra; dist drops the ‖x‖² term)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    sq = jnp.sum((x2 + m) * valid, keepdims=True)[:1, :1]

    @pl.when(i == 0)
    def _init():
        counts_acc[:] = jnp.zeros_like(counts_acc)
        sq_acc[:] = jnp.zeros_like(sq_acc)

    counts_acc[:] = counts_acc[:] + jnp.sum(onehot * valid, axis=0,
                                            keepdims=True)
    sq_acc[:] = sq_acc[:] + sq

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        counts_ref[:] = counts_acc[:]
        sq_ref[:] = sq_acc[:]


@jax.jit
def vq_lean_fwd(flat_x, codebook):
    n, d = flat_x.shape
    k = codebook.shape[0]
    n_tiles = pl.cdiv(n, TILE)
    n_pad = n_tiles * TILE
    x = flat_x.astype(jnp.float32)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    cb = codebook.astype(jnp.float32)
    e2 = jnp.sum(cb * cb, axis=1)[None, :]
    idx, counts, sq = pl.pallas_call(
        functools.partial(_lean_kernel, n, TILE),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32),
                        pltpu.VMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, cb, e2)
    # quantized via XLA gather — no scatter VJP exists (custom VJP owns bwd)
    quantized = jnp.take(cb, idx[:n, 0], axis=0)
    return quantized, idx[:n, 0], counts[0], sq[0, 0]


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
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_msla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from msla_tpu.ops.vq_fused import vq_fused_fwd_pallas

    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)

    # regimes: random input; near-converged (x = cb rows + tiny noise)
    x_rand = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    rows = rng.integers(0, K, N)
    x_conv = jnp.asarray(np.asarray(cb)[rows]
                         + 1e-3 * rng.standard_normal((N, D)), jnp.float32)

    for name, x in [("random", x_rand), ("converged", x_conv)]:
        q0, i0, c0, s0 = vq_fused_fwd_pallas(x, cb)
        q1, i1, c1, s1 = vq_lean_fwd(x, cb)
        print(f"[{name}] idx mismatch {int(jnp.sum(i0 != i1))}/{N} "
              f"| counts equal {bool(jnp.all(c0 == c1))} "
              f"| q max err {float(jnp.max(jnp.abs(q0 - q1))):.2e} "
              f"| sq rel err {abs(float(s1 - s0)) / max(float(s0), 1e-9):.2e} "
              f"(sq={float(s0):.4e})", flush=True)

    def consume_ship(c, xx, cbk):
        q, i, cc, ss = vq_fused_fwd_pallas(xx + c * 1e-12, cbk)
        return (q[0, 0] + ss + cc[0]) * 1e-9

    def consume_lean(c, xx, cbk):
        q, i, cc, ss = vq_lean_fwd(xx + c * 1e-12, cbk)
        return (q[0, 0] + ss + cc[0]) * 1e-9

    for name, fn in [("shipping", consume_ship), ("lean    ", consume_lean)]:
        t = loop_time(fn, x_rand, cb)
        print(f"fwd {name}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

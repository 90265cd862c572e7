#!/usr/bin/env python
"""TPU bench: fused-VQ kernel dot-precision variants.

Hypothesis (PERFORMANCE.md round-2 follow-up): the fused kernel's two fp32
MXU matmuls (distance x·cbᵀ and quantize onehot·cb) lower to multi-pass
bf16 emulation, which would account for most of the measured 8.31 ms fwd
(single-pass floor ≈ 0.5 ms for 2×92 GFLOP). In bf16 training the VQ input
is ALREADY bf16-rounded (encoder output), so a bf16 distance matmul loses
only the codebook's low mantissa bits; the quantize matmul can stay exact
to ~f32 via a hi/lo bf16 split of the codebook (2 passes instead of 6).

Variants measured fwd (all outputs consumed) at N=704k, K=512, D=64:
  f32     — current kernel (baseline)
  bf16    — both dots bf16×bf16→f32
  split2  — dist bf16, quantize = onehot @ (cb_hi + cb_lo) two-pass
  split3  — dist bf16x3 (hi/lo x and cb), quantize split2

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_vq_precision.py
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


def make_fwd(dist_mode: str, quant_mode: str):
    def kernel(n_valid, tile, x_ref, cb_ref, cbh_ref, cbl_ref, e2_ref,
               q_ref, idx_ref, counts_ref, sq_ref, counts_acc, sq_acc):
        i = pl.program_id(0)
        x = x_ref[:]
        cb = cb_ref[:]
        if dist_mode == "f32":
            dots = lax.dot_general(x, cb, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        elif dist_mode == "bf16":
            dots = lax.dot_general(x.astype(jnp.bfloat16), cbh_ref[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        elif dist_mode == "split3":
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            dots = (lax.dot_general(xh, cbh_ref[:], dn, preferred_element_type=jnp.float32)
                    + lax.dot_general(xh, cbl_ref[:], dn, preferred_element_type=jnp.float32)
                    + lax.dot_general(xl, cbh_ref[:], dn, preferred_element_type=jnp.float32))
        dist = e2_ref[:] - 2.0 * dots
        m = jnp.min(dist, axis=1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        idx = jnp.min(jnp.where(dist <= m, lane, dist.shape[1]), axis=1,
                      keepdims=True)
        row = i * tile + lax.broadcasted_iota(jnp.int32, idx.shape, 0)
        valid = (row < n_valid).astype(jnp.float32)
        onehot = (lane == idx).astype(jnp.float32)
        if quant_mode == "f32":
            quantized = lax.dot_general(onehot, cb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        else:  # split2: exact row select of cb_hi + cb_lo
            oh = onehot.astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            quantized = (lax.dot_general(oh, cbh_ref[:], dn, preferred_element_type=jnp.float32)
                         + lax.dot_general(oh, cbl_ref[:], dn, preferred_element_type=jnp.float32))
        q_ref[:] = quantized
        idx_ref[:] = idx
        diff = quantized - x
        sq = jnp.sum(diff * diff * valid, keepdims=True)[:1, :1]

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

    @functools.partial(jax.jit, static_argnames=())
    def run(flat_x, codebook):
        n, d = flat_x.shape
        k = codebook.shape[0]
        n_tiles = pl.cdiv(n, TILE)
        n_pad = n_tiles * TILE
        x = flat_x.astype(jnp.float32)
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        cb = codebook.astype(jnp.float32)
        cbh = cb.astype(jnp.bfloat16)
        cbl = (cb - cbh.astype(jnp.float32)).astype(jnp.bfloat16)
        if dist_mode == "f32":
            e2 = jnp.sum(cb * cb, axis=1)[None, :]
        else:  # e2 consistent with the dotted codebook representation
            cbe = (cbh.astype(jnp.float32) if dist_mode == "bf16"
                   else cbh.astype(jnp.float32) + cbl.astype(jnp.float32))
            e2 = jnp.sum(cbe * cbe, axis=1)[None, :]
        return pl.pallas_call(
            functools.partial(kernel, n, TILE),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, k), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((1, k), jnp.float32),
                            pltpu.VMEM((1, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, cb, cbh, cbl, e2)

    return run


def make_bwd(mode: str):
    def kernel(k, g_ref, gl_ref, idx_ref, dcb_ref, acc):
        i = pl.program_id(0)
        lane = lax.broadcasted_iota(jnp.int32, (g_ref.shape[0], k), 1)
        onehot = (lane == idx_ref[:]).astype(jnp.float32)
        if mode == "f32":
            contrib = lax.dot_general(onehot, g_ref[:], (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        else:  # split2 of g
            oh = onehot.astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))
            contrib = (lax.dot_general(oh, g_ref[:].astype(jnp.bfloat16), dn,
                                       preferred_element_type=jnp.float32)
                       + lax.dot_general(oh, gl_ref[:], dn,
                                         preferred_element_type=jnp.float32))

        @pl.when(i == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        acc[:] = acc[:] + contrib

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            dcb_ref[:] = acc[:]

    @jax.jit
    def run(g_eff, idx):
        n, d = g_eff.shape
        n_tiles = pl.cdiv(n, TILE)
        n_pad = n_tiles * TILE
        g = g_eff.astype(jnp.float32)
        idx2 = idx.reshape(n, 1)
        if n_pad != n:
            g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
            idx2 = jnp.pad(idx2, ((0, n_pad - n), (0, 0)))
        gl = (g - g.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)
        return pl.pallas_call(
            functools.partial(kernel, K),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(g, gl, idx2)

    return run


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
    rng = np.random.default_rng(0)
    # bf16-rounded input: what the encoder actually hands the VQ in training
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    cb = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)

    ref = None
    for name, (dm, qm) in [("f32/f32", ("f32", "f32")),
                           ("bf16/split2", ("bf16", "split2")),
                           ("bf16/f32", ("bf16", "f32")),
                           ("split3/split2", ("split3", "split2"))]:
        fn = make_fwd(dm, qm)
        q, idx, counts, sq = fn(x, cb)
        q, idx = q[:N], idx[:N]
        if ref is None:
            ref = (q, idx, sq)
        mism = int(jnp.sum(idx[:, 0] != ref[1][:, 0]))
        qerr = float(jnp.max(jnp.abs(q - ref[0])))
        sqerr = abs(float(sq[0, 0] - ref[2][0, 0]) / float(ref[2][0, 0]))

        def consume(c, xx, cbk):
            qq, ii, cc, ss = fn(xx + c * 1e-12, cbk)
            return (qq[0, 0] + ss[0, 0] + cc[0, 0]) * 1e-9

        t = loop_time(consume, x, cb)
        print(f"fwd {name:<14s}: {t*1e3:7.2f} ms | idx mismatch {mism}/{N} "
              f"| max|q-ref| {qerr:.2e} | sq rel err {sqerr:.2e}", flush=True)

    g_eff = jnp.asarray(rng.standard_normal((N, D)), jnp.float32) * 1e-3
    _, idx, _, _ = make_fwd("f32", "f32")(x, cb)
    idx = idx[:N]  # kernel returns the padded length
    refb = None
    for name in ["f32", "split2"]:
        fn = make_bwd(name)
        dcb = fn(g_eff, idx[:, 0])
        if refb is None:
            refb = dcb
        err = float(jnp.max(jnp.abs(dcb - refb)) / (jnp.max(jnp.abs(refb)) + 1e-30))

        def consume(c, gg, ii):
            return fn(gg + c * 1e-12, ii)[0, 0] * 1e-9

        t = loop_time(consume, g_eff, idx[:, 0])
        print(f"bwd {name:<14s}: {t*1e3:7.2f} ms | rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
